/* Native data loader: BAM/SAM decoding, mate collation, coverage tracking,
 * and a sound pre-classifier that keeps the uninteresting majority of reads
 * entirely in C++ (the reference's data path is C++ too,
 * read_chimeric_alignments.cpp:560-773).
 *
 * Division of labor with the Python ingest:
 *  - C++ decodes every record (BGZF/gzip via zlib), collates mates, and for
 *    "boring" pairs (proper pair, no SA tag, no soft clip >= 12, fragment
 *    not spanning any gene boundary) performs the full bookkeeping: mapped-
 *    read counting, pristine-viral-read counting, and the coverage walk
 *    (port of read_stats.cpp:146-266 semantics as implemented in
 *    arriba_tpu/ingest/stats.py).
 *  - Everything else is forwarded to Python as SAM text, where the exact
 *    extraction logic (ITD rescue, read-through splitting, SA split reads)
 *    runs unchanged — so parity is owned by one implementation only.
 *
 * The boring classifier is a *sound superset* filter: any record that could
 * influence chimeric extraction is forwarded.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <sys/stat.h>
#include <sys/mman.h>
#include <fcntl.h>
#include <unistd.h>

#include <zlib.h>

#include "bgzf_parallel.h"

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <memory>
#include <random>
#include <thread>
#if defined(__SSE2__)
#include <immintrin.h>
#endif
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

#include "extract.h"
#include "codecs.h"

namespace {

constexpr int FPAIRED = 1, FPROPER_PAIR = 2, FUNMAP = 4, FMUNMAP = 8,
              FREVERSE = 16, FSECONDARY = 256, FDUP = 1024, FSUPPLEMENTARY = 2048;
constexpr int CMATCH = 0, CINS = 1, CDEL = 2, CREF_SKIP = 3, CSOFT_CLIP = 4,
              CHARD_CLIP = 5, CEQUAL = 7, CDIFF = 8;
constexpr int COVERAGE_RESOLUTION = 20;
constexpr int MIN_CLIPPED_FORWARD = 12;  /* is_tandem_duplication min_clipped_length */
constexpr uint32_t CONSUMES_QUERY = (1u << CMATCH) | (1u << CINS) | (1u << CSOFT_CLIP) |
                                    (1u << CEQUAL) | (1u << CDIFF);
constexpr uint32_t CONSUMES_REF = (1u << CMATCH) | (1u << CDEL) | (1u << CREF_SKIP) |
                                  (1u << CEQUAL) | (1u << CDIFF);

const char CIGAR_CHARS[] = "MIDNSHP=XB";
/* op char -> op code (+1; 0 = invalid), avoiding a strchr per CIGAR op */
struct CigarOpLut {
    uint8_t code[256] = {};
    CigarOpLut() {
        for (int i = 0; CIGAR_CHARS[i] != 0; ++i)
            code[(uint8_t)CIGAR_CHARS[i]] = (uint8_t)(i + 1);
    }
};
const CigarOpLut CIGAR_OP_LUT;
const char NT16[] = "=ACMGRSVTWYHKDBN";

struct Record {
    std::string line;          /* SAM text (set for SAM input; lazily built
                                  from bam_body for BAM input) */
    std::vector<uint8_t> bam_body;  /* raw BAM record body (BAM input only) */
    uint16_t flag = 0;
    int32_t tid = -1;
    int64_t pos = 0;           /* 0-based */
    int64_t end_pos = 0;       /* 0-based exclusive (pos + ref-consumed) */
    int32_t mtid = -1;
    std::vector<uint32_t> cigar;
    std::string seq;
    bool has_sa = false;
    bool hi_present = false;
    int64_t hi_value = 0;
    int max_soft_clip = 0;
    /* QNAME/RNAME/SEQ spans within the just-parsed SAM line (valid only
     * while the caller still holds that line; let the caller shard by
     * name, resolve tid, and materialize seq lazily without re-scanning
     * fields) */
    uint32_t qname_len = 0;
    uint32_t rname_start = 0, rname_len = 0;
    uint32_t seq_start = 0, seq_len_span = 0;
    /* absolute input byte offset of the record's line (sharded-sample
     * workers only): orders cross-boundary leftover replay like the
     * single-process arrival order */
    int64_t file_pos = 0;
};

struct CoveragePlane {
    uint16_t *coverage = nullptr;
    uint8_t *starts = nullptr;
    uint8_t *ends = nullptr;
    Py_ssize_t windows = 0;
};

inline void record_swap(Record &dst, Record &src);

/* allocation-free mate collation for the extract path: an open-addressing
 * index (linear probing, backward-shift deletion) over a Record pool with a
 * freelist. The std::unordered_map version paid a node malloc per first
 * mate and a full node free (line/seq/cigar buffers included) per completed
 * pair; here the pool entry's heap buffers are recycled through the
 * freelist, so steady state performs no allocation at all. Leftover
 * entries at EOF are simply dropped (the extract path never iterates
 * unmatched first-mates — chimeric.py drops them too). */
struct Collator {
    struct Entry {
        std::string name;      /* QNAME only (no ",HI" suffix) */
        long long hit = 0;     /* HI tag value (1 when absent) */
        Record rec;
    };
    std::vector<Entry> pool;
    std::vector<uint32_t> freelist;
    std::vector<uint64_t> hashes;  /* valid where index[slot] != 0 */
    std::vector<uint32_t> index;   /* pool idx + 1; 0 = empty */
    size_t mask = 0;
    size_t count = 0;

    void init(size_t capacity_hint) {
        size_t cap = 1024;
        while (cap < capacity_hint * 2)
            cap <<= 1;
        hashes.assign(cap, 0);
        index.assign(cap, 0);
        mask = cap - 1;
        count = 0;
        pool.clear();
        freelist.clear();
    }

    void grow() {
        std::vector<uint64_t> old_hashes(std::move(hashes));
        std::vector<uint32_t> old_index(std::move(index));
        size_t cap = (mask + 1) << 1;
        hashes.assign(cap, 0);
        index.assign(cap, 0);
        mask = cap - 1;
        for (size_t j = 0; j < old_index.size(); ++j) {
            if (old_index[j] == 0)
                continue;
            size_t slot = (size_t)(old_hashes[j] & mask);
            while (index[slot] != 0)
                slot = (slot + 1) & mask;
            index[slot] = old_index[j];
            hashes[slot] = old_hashes[j];
        }
    }

    /* backward-shift deletion keeps probe chains contiguous (no tombstones) */
    void remove_slot(size_t i) {
        size_t j = i;
        for (;;) {
            j = (j + 1) & mask;
            if (index[j] == 0)
                break;
            size_t ideal = (size_t)(hashes[j] & mask);
            bool fits = (j > i) ? (ideal <= i || ideal > j)
                                : (ideal <= i && ideal > j);
            if (fits) {
                index[i] = index[j];
                hashes[i] = hashes[j];
                i = j;
            }
        }
        index[i] = 0;
    }

    /* pool idx+1 if found (unlinked from the table; the caller must
     * release() when done with the entry) or 0 */
    uint32_t find_extract(uint64_t h, std::string_view name, long long hit) {
        size_t slot = (size_t)(h & mask);
        while (index[slot] != 0) {
            if (hashes[slot] == h) {
                Entry &entry = pool[index[slot] - 1];
                if (entry.hit == hit && entry.name == name) {
                    uint32_t idx = index[slot];
                    remove_slot(slot);
                    count -= 1;
                    return idx;
                }
            }
            slot = (slot + 1) & mask;
        }
        return 0;
    }

    void insert(uint64_t h, std::string_view name, long long hit,
                Record &rec) {
        if ((count + 1) * 10 > (mask + 1) * 7)
            grow();
        uint32_t idx;
        if (!freelist.empty()) {
            idx = freelist.back();
            freelist.pop_back();
        } else {
            pool.emplace_back();
            idx = (uint32_t)pool.size();
        }
        Entry &entry = pool[idx - 1];
        entry.name.assign(name.data(), name.size());
        entry.hit = hit;
        record_swap(entry.rec, rec);
        size_t slot = (size_t)(h & mask);
        while (index[slot] != 0)
            slot = (slot + 1) & mask;
        index[slot] = idx;
        hashes[slot] = h;
        count += 1;
    }

    void release(uint32_t idx) { freelist.push_back(idx); }
};

/* ---- binned coverage writes ---------------------------------------------
 *
 * On an unsorted (STAR-order) input the coverage-plane writes of
 * add_fragment scatter across planes far larger than LLC — at human scale
 * (3.1 Gb / 20 bp = 155 M windows, ~620 MB of planes) every increment is a
 * DRAM-latency miss, and in the sharded scan each one was additionally an
 * atomic CAS on a shared line. Instead of writing through, the scan appends
 * compact run-length entries to per-granule buckets (a granule = 2^16
 * consecutive windows in a global window space ≈ 256 KB of plane bytes) and
 * flushes a bucket cache-hot when it fills. Flushes take the granule's
 * spinlock, so the plane writes themselves are plain stores even when the
 * planes are shared across shard workers. Increment counts and flag ORs are
 * commutative and the per-window saturation (0xFFFF) depends only on the
 * per-window total, so the result is byte-identical to the write-through
 * scan in any order.
 *
 * entry: [op:2][tid:14][len:16][window:32]
 *   op 0 = coverage += 1 over windows [window, window+len)
 *   op 1 = starts[window] = 1          (len unused)
 *   op 2 = ends[window]   = 1          (len unused)
 * Ranges are split at granule boundaries on append, so a flush touches only
 * its own granule's region.
 */

struct CoverageBins {
    static constexpr int GRANULE_BITS = 16;
    static constexpr size_t FLUSH_AT = 1024;
    bool enabled = false;
    std::vector<int64_t> tid_base;            /* per tid: global window base */
    std::vector<std::vector<uint64_t>> buckets;
    std::atomic<uint32_t> *locks = nullptr;   /* per granule; null = serial */

    void init(const std::vector<CoveragePlane> &planes,
              std::atomic<uint32_t> *granule_locks) {
        tid_base.resize(planes.size() + 1);
        int64_t total = 0;
        for (size_t t = 0; t < planes.size(); ++t) {
            tid_base[t] = total;
            total += planes[t].windows;
        }
        tid_base[planes.size()] = total;
        buckets.assign((size_t)((total >> GRANULE_BITS) + 1), {});
        locks = granule_locks;
        enabled = true;
    }
};

struct Scanner {
    std::vector<CoveragePlane> planes;                 /* per tid */
    CoverageBins bins;
    std::vector<std::vector<int64_t>> boundaries;      /* per tid, sorted */
    /* 2 kb-resolution occupancy map over `boundaries`: the boring-pair test
     * probes 1-2 bytes instead of running two binary searches per fragment
     * (the exact search only runs when a boundary is nearby) */
    std::vector<std::vector<uint8_t>> boundary_map;    /* per tid */
    std::vector<uint8_t> interesting;                  /* per tid */
    std::vector<uint8_t> viral;                        /* per tid */
    std::vector<int64_t> viral_counts;                 /* per tid */
    bool external_duplicate_marking = false;
    bool atomic_coverage = false;  /* sharded scan: planes are shared across
                                      worker threads; all writes must be
                                      atomic (saturating adds and idempotent
                                      stores commute, so the result is
                                      byte-identical to the serial scan) */
    long boring_mapped_reads = 0;
    long n_records = 0;
    std::string forwarded;
    std::unordered_map<std::string, Record> collated;
    Collator coll;  /* extract path: pooled, allocation-free collation */
    /* one-slot cache in front of the collation map: STAR writes mates
     * adjacently, so most pairs complete without ever touching the map
     * (same pairing semantics — the slot spills into the map when
     * displaced) */
    bool has_pending = false;
    std::string pending_name;      /* QNAME only */
    long long pending_hit = 0;
    Record pending;
    std::string name_scratch;  /* per-call "qname,HI" build buffer: reused
                                  capacity instead of a heap string per record */
};

/* copy into recycled storage: unlike a move, this leaves the source's heap
 * buffers in place (the decoded[] batch slots recycle them every chunk) and
 * reuses the destination's — the collation hot path stays allocation-free */
inline void record_assign(Record &dst, const Record &src) {
    dst.file_pos = src.file_pos;
    dst.line.assign(src.line);
    dst.bam_body.assign(src.bam_body.begin(), src.bam_body.end());
    dst.flag = src.flag;
    dst.tid = src.tid;
    dst.pos = src.pos;
    dst.end_pos = src.end_pos;
    dst.mtid = src.mtid;
    dst.cigar.assign(src.cigar.begin(), src.cigar.end());
    dst.seq.assign(src.seq);
    dst.has_sa = src.has_sa;
    dst.hi_present = src.hi_present;
    dst.hi_value = src.hi_value;
    dst.max_soft_clip = src.max_soft_clip;
}

/* swap variant for the pending-mate slot: exchanges heap buffers instead of
 * copying their bytes (the source is a decoded[] batch slot that is dead
 * until the next chunk's parse recycles whatever capacity it holds) */
inline void record_swap(Record &dst, Record &src) {
    std::swap(dst.file_pos, src.file_pos);
    dst.line.swap(src.line);
    dst.bam_body.swap(src.bam_body);
    dst.cigar.swap(src.cigar);
    dst.seq.swap(src.seq);
    dst.flag = src.flag;
    dst.tid = src.tid;
    dst.pos = src.pos;
    dst.end_pos = src.end_pos;
    dst.mtid = src.mtid;
    dst.has_sa = src.has_sa;
    dst.hi_present = src.hi_present;
    dst.hi_value = src.hi_value;
    dst.max_soft_clip = src.max_soft_clip;
}

inline void coverage_increment(uint16_t *slot, bool atomic) {
    if (!atomic) {
        if (*slot < 0xFFFF) *slot += 1;
        return;
    }
    uint16_t current = __atomic_load_n(slot, __ATOMIC_RELAXED);
    while (current < 0xFFFF &&
           !__atomic_compare_exchange_n(slot, &current, (uint16_t)(current + 1),
                                        true, __ATOMIC_RELAXED, __ATOMIC_RELAXED)) {
    }
}

inline void flag_store(uint8_t *slot, bool atomic) {
    if (atomic)
        __atomic_store_n(slot, (uint8_t)1, __ATOMIC_RELAXED);
    else
        *slot = 1;
}

/* prefetch the coverage-plane cache lines a fragment at (tid, pos..end)
 * will touch: the consume loop's increments scatter across multi-MB planes
 * and are otherwise a chain of demand misses (~4 lines per pair). With
 * binned coverage the plane writes are deferred, so only the boring-test's
 * boundary-map probe still needs its line early. */
template <typename ScannerT>
inline void prefetch_fragment_planes(ScannerT &scanner, int tid,
                                     int64_t pos, int64_t end_pos) {
    if (tid < 0 || tid >= (int)scanner.planes.size())
        return;
    if (tid < (int)scanner.boundary_map.size() &&
        !scanner.boundary_map[tid].empty()) {
        const std::vector<uint8_t> &bmap = scanner.boundary_map[tid];
        int64_t b = ((pos - 3) >> 11) >> 3;
        if (b >= 0 && b < (int64_t)bmap.size())
            __builtin_prefetch(&bmap[b]);
    }
    if (scanner.bins.enabled)
        return;
    auto &plane = scanner.planes[tid];
    if (plane.windows == 0)
        return;
    int64_t w0 = pos / COVERAGE_RESOLUTION;
    if (w0 < 0 || w0 >= plane.windows)
        return;
    __builtin_prefetch(&plane.coverage[w0]);
    int64_t w1 = end_pos / COVERAGE_RESOLUTION;
    if (w1 > w0 && w1 < plane.windows)
        __builtin_prefetch(&plane.coverage[w1]);
    __builtin_prefetch(&plane.starts[w0]);
    __builtin_prefetch(&plane.ends[w0]);
}

/* ---- binned-coverage append/flush (see CoverageBins) -------------------- */

inline void bins_flush_bucket(Scanner &sc, size_t b) {
    std::vector<uint64_t> &bucket = sc.bins.buckets[b];
    if (bucket.empty())
        return;
    std::atomic<uint32_t> *lock =
        sc.bins.locks != nullptr ? sc.bins.locks + b : nullptr;
    if (lock != nullptr)
        while (lock->exchange(1, std::memory_order_acquire) != 0) {
        }
    for (uint64_t entry : bucket) {
        uint32_t op = (uint32_t)(entry >> 62);
        uint32_t tid = (uint32_t)((entry >> 48) & 0x3FFF);
        uint32_t len = (uint32_t)((entry >> 32) & 0xFFFF);
        int64_t w = (int64_t)(uint32_t)entry;
        CoveragePlane &plane = sc.planes[tid];
        if (op == 0) {
            uint16_t *cov = plane.coverage + w;
#if defined(__SSE2__)
            /* PADDUSW saturates at 0xFFFF — exactly the per-window clamp */
            const __m128i ones = _mm_set1_epi16(1);
            uint32_t k = 0;
            for (; k + 8 <= len; k += 8) {
                __m128i v = _mm_loadu_si128((const __m128i *)(cov + k));
                _mm_storeu_si128((__m128i *)(cov + k),
                                 _mm_adds_epu16(v, ones));
            }
            for (; k < len; ++k)
                if (cov[k] < 0xFFFF) cov[k] += 1;
#else
            for (uint32_t k = 0; k < len; ++k)
                if (cov[k] < 0xFFFF) cov[k] += 1;
#endif
        } else if (op == 1) {
            plane.starts[w] = 1;
        } else {
            plane.ends[w] = 1;
        }
    }
    if (lock != nullptr)
        lock->store(0, std::memory_order_release);
    bucket.clear();
}

inline void bins_push(Scanner &sc, uint64_t entry, size_t b) {
    std::vector<uint64_t> &bucket = sc.bins.buckets[b];
    bucket.push_back(entry);
    if (bucket.size() >= CoverageBins::FLUSH_AT)
        bins_flush_bucket(sc, b);
}

/* coverage += 1 over the inclusive window range [w, top]; caller clamps */
inline void bins_cov_range(Scanner &sc, int tid, int64_t w, int64_t top) {
    int64_t g = sc.bins.tid_base[tid] + w;
    while (w <= top) {
        int64_t granule_end = ((g >> CoverageBins::GRANULE_BITS) + 1)
                              << CoverageBins::GRANULE_BITS;
        int64_t len = std::min(top - w + 1,
                               std::min(granule_end - g, (int64_t)0xFFFF));
        bins_push(sc,
                  (uint64_t)tid << 48 | (uint64_t)len << 32
                      | (uint64_t)(uint32_t)w,
                  (size_t)(g >> CoverageBins::GRANULE_BITS));
        w += len;
        g += len;
    }
}

inline void bins_flag(Scanner &sc, int op, int tid, int64_t w) {
    int64_t g = sc.bins.tid_base[tid] + w;
    bins_push(sc,
              (uint64_t)op << 62 | (uint64_t)tid << 48 | (uint64_t)1 << 32
                  | (uint64_t)(uint32_t)w,
              (size_t)(g >> CoverageBins::GRANULE_BITS));
}

void bins_flush_all(Scanner &sc) {
    if (!sc.bins.enabled)
        return;
    for (size_t b = 0; b < sc.bins.buckets.size(); ++b)
        bins_flush_bucket(sc, b);
}

/* dispatchers: binned when enabled, write-through otherwise */
inline void cov_inc_range(Scanner &sc, int tid, CoveragePlane &plane,
                          int64_t w, int64_t top) {
    if (w > top)
        return;
    if (sc.bins.enabled) {
        bins_cov_range(sc, tid, w, top);
        return;
    }
    for (; w <= top; ++w)
        coverage_increment(&plane.coverage[w], sc.atomic_coverage);
}

inline void cov_flag(Scanner &sc, int op /* 1=starts, 2=ends */, int tid,
                     CoveragePlane &plane, int64_t w) {
    if (sc.bins.enabled) {
        bins_flag(sc, op, tid, w);
        return;
    }
    flag_store(op == 1 ? &plane.starts[w] : &plane.ends[w],
               sc.atomic_coverage);
}

/* ---- coverage walk: port of arriba_tpu/ingest/stats.py add_fragment ---- */

void add_fragment(Scanner &scanner, const Record &mate1_in, const Record *mate2_in,
                  bool is_chimeric, uint16_t flag_override, bool has_override) {
    const Record &mate1 = mate1_in;
    const Record &mate2 = (mate2_in != nullptr) ? *mate2_in : mate1_in;
    uint16_t flag1 = has_override ? flag_override : mate1.flag;

    if (mate1.tid < 0 || mate1.tid >= (int)scanner.planes.size() ||
        mate2.tid < 0 || mate2.tid >= (int)scanner.planes.size())
        return;
    CoveragePlane &plane1 = scanner.planes[mate1.tid];
    CoveragePlane &plane2 = scanner.planes[mate2.tid];
    if (plane1.windows == 0 || plane2.windows == 0)
        return;

    if (flag1 & FPAIRED) {
        if (!(flag1 & FPROPER_PAIR))
            is_chimeric = true;
    }

    if (!is_chimeric) {
        if (!(flag1 & FREVERSE) || !(flag1 & FPAIRED)) {
            int64_t w = mate1.pos / COVERAGE_RESOLUTION;
            if (w >= 0 && w < plane1.windows)
                cov_flag(scanner, 1, mate1.tid, plane1, w);
        } else {
            int64_t w = mate2.pos / COVERAGE_RESOLUTION;
            if (w >= 0 && w < plane2.windows)
                cov_flag(scanner, 1, mate2.tid, plane2, w);
        }
    }

    int64_t position1 = mate1.pos;
    int64_t position2 = mate2.pos;
    int64_t window = std::min(position1, position2) / COVERAGE_RESOLUTION;
    size_t i1 = 0, i2 = 0;
    const std::vector<uint32_t> &cigar1 = mate1.cigar;
    const std::vector<uint32_t> &cigar2 = mate2.cigar;
    const size_t n1 = cigar1.size(), n2 = cigar2.size();

    /* fast path for the overwhelming majority: both mates a single
     * query+ref-consuming op (plain xM) on one contig. The dual-CIGAR merge
     * walk then reduces to two contiguous window-range increments — windows
     * [min-start .. min-end] counted against the nearer end, the remainder
     * up to the farther end against it, each window once per fragment, and
     * a window only while the governing end reaches >= half into it. */
    if (n1 == 1 && n2 == 1 && mate1.tid == mate2.tid) {
        const uint32_t op1 = cigar1[0] & 0xf, op2 = cigar2[0] & 0xf;
        if (((CONSUMES_REF >> op1) & (CONSUMES_QUERY >> op1) &
             (CONSUMES_REF >> op2) & (CONSUMES_QUERY >> op2)) & 1) {
            /* derive ends from the op itself: some callers (the Python
             * coverage_add binding) never populate end_pos */
            const int64_t end1 = mate1.pos + (int64_t)(cigar1[0] >> 4);
            const int64_t end2 = mate2.pos + (int64_t)(cigar2[0] >> 4);
            const int64_t near_end = std::min(end1, end2);
            const int64_t far_end = std::max(end1, end2);
            /* start of the mate that ends farther: after the nearer mate is
             * exhausted the walk jumps there, skipping inter-mate gap
             * windows (ties process mate2 first, then mate1 adds nothing) */
            const int64_t far_start = end1 < end2 ? mate2.pos : mate1.pos;
            const int64_t half = COVERAGE_RESOLUTION / 2;
            CoveragePlane &plane = plane1;
            int64_t w = std::max(window, (int64_t)0);
            int64_t top = std::min(near_end >= half
                                       ? (near_end - half) / COVERAGE_RESOLUTION
                                       : (int64_t)-1,
                                   (int64_t)plane.windows - 1);
            cov_inc_range(scanner, mate1.tid, plane, w, top);
            w = std::max(near_end / COVERAGE_RESOLUTION + 1,
                         std::max(far_start / COVERAGE_RESOLUTION,
                                  (int64_t)0));
            top = std::min(far_end >= half
                               ? (far_end - half) / COVERAGE_RESOLUTION
                               : (int64_t)-1,
                           (int64_t)plane.windows - 1);
            cov_inc_range(scanner, mate1.tid, plane, w, top);
            if (!is_chimeric) {
                if ((flag1 & FREVERSE) || !(flag1 & FPAIRED)) {
                    int64_t we = (end1 - 1) / COVERAGE_RESOLUTION;
                    if (we >= 0 && we < plane1.windows)
                        cov_flag(scanner, 2, mate1.tid, plane1, we);
                } else {
                    int64_t we = (end2 - 1) / COVERAGE_RESOLUTION;
                    if (we >= 0 && we < plane2.windows)
                        cov_flag(scanner, 2, mate2.tid, plane2, we);
                }
            }
            return;
        }
    }

    for (;;) {
        int64_t op_length1 = 0, op_length2 = 0;
        uint32_t word1 = 0, word2 = 0;
        if (i1 < n1) {
            word1 = cigar1[i1];
            op_length1 = (CONSUMES_REF >> (word1 & 0xf)) & 1 ? (word1 >> 4) : 0;
        } else {
            window = std::max(window, position2 / COVERAGE_RESOLUTION);
        }
        if (i2 < n2) {
            word2 = cigar2[i2];
            op_length2 = (CONSUMES_REF >> (word2 & 0xf)) & 1 ? (word2 >> 4) : 0;
        } else {
            window = std::max(window, position1 / COVERAGE_RESOLUTION);
        }

        uint32_t word;
        int32_t contig;
        int64_t position;
        if (i1 < n1 && (position1 + op_length1 < position2 + op_length2 || i2 >= n2)) {
            i1++;
            if (op_length1 == 0) continue;
            word = word1;
            contig = mate1.tid;
            position1 += op_length1;
            position = position1;
        } else if (i2 < n2) {
            i2++;
            if (op_length2 == 0) continue;
            word = word2;
            contig = mate2.tid;
            position2 += op_length2;
            position = position2;
        } else {
            break;
        }

        CoveragePlane &plane = scanner.planes[contig];
        if ((CONSUMES_QUERY >> (word & 0xf)) & 1) {
            while (window <= position / COVERAGE_RESOLUTION) {
                if (window >= 0 && window < plane.windows &&
                    position - window * COVERAGE_RESOLUTION >= COVERAGE_RESOLUTION / 2)
                    cov_inc_range(scanner, contig, plane, window, window);
                window += 1;
            }
        } else {
            window = position / COVERAGE_RESOLUTION;
        }
    }

    if (!is_chimeric) {
        if ((flag1 & FREVERSE) || !(flag1 & FPAIRED)) {
            int64_t w = (position1 - 1) / COVERAGE_RESOLUTION;
            if (w >= 0 && w < plane1.windows)
                cov_flag(scanner, 2, mate1.tid, plane1, w);
        } else {
            int64_t w = (position2 - 1) / COVERAGE_RESOLUTION;
            if (w >= 0 && w < plane2.windows)
                cov_flag(scanner, 2, mate2.tid, plane2, w);
        }
    }
}

/* ---- pristine-alignment test (read_chimeric_alignments.cpp:526-558) ---- */

bool is_pristine_alignment(const Record &record) {
    for (uint32_t word : record.cigar) {
        uint32_t op = word & 0xf;
        if (op != CREF_SKIP && op != CMATCH && op != CDIFF)
            return false;
    }
    const std::string &sequence = record.seq;
    int64_t repeat = 0, count = 1;
    int64_t i = 2;
    int64_t n = (int64_t)sequence.size();
    while (i + 2 < n) {
        if (sequence[i] == sequence[repeat] && sequence[i + 1] == sequence[repeat + 1]) {
            count += 1;
        } else if (sequence[i + 1] == sequence[repeat + 1] &&
                   sequence[i + 2] == sequence[repeat + 2]) {
            count += 1;
            i += 1;
        } else {
            count = 1;
            repeat = i;
        }
        if (count >= 8)
            return false;
        i += 2;
    }
    return true;
}

/* ---- boring classifier -------------------------------------------------- */

bool spans_gene_boundary(const Scanner &scanner, int tid, int64_t lo, int64_t hi) {
    if (tid < 0 || tid >= (int)scanner.boundaries.size())
        return false;
    const std::vector<int64_t> &bounds = scanner.boundaries[tid];
    if (bounds.empty())
        return false;
    /* coarse occupancy prefilter: a boundary in [lo-3, hi+2] implies a set
     * byte in the 2 kb map — most fragments probe 1-2 bytes and exit */
    const std::vector<uint8_t> &bmap = scanner.boundary_map[tid];
    int64_t from = (lo - 3) >> 11;
    if (from < 0) from = 0;
    int64_t to = (hi + 2) >> 11;
    int64_t max_granule = (int64_t)bmap.size() * 8 - 1;
    if (to > max_granule) to = max_granule;
    bool nearby = false;
    for (int64_t b = from; b <= to; ++b)
        if (bmap[b >> 3] & (1u << (b & 7))) { nearby = true; break; }
    if (!nearby)
        return false;
    /* forward if the (slack-padded) interval contains a boundary, meaning the
     * gene set can change inside the fragment */
    auto first = std::lower_bound(bounds.begin(), bounds.end(), lo - 3);
    auto second = std::lower_bound(bounds.begin(), bounds.end(), hi + 3);
    return first != second;
}

bool pair_is_boring(const Scanner &scanner, const Record &record, const Record &mate) {
    if (record.has_sa || mate.has_sa)
        return false;
    if (record.max_soft_clip >= MIN_CLIPPED_FORWARD ||
        mate.max_soft_clip >= MIN_CLIPPED_FORWARD)
        return false;
    if (record.tid != mate.tid)
        return false;
    int64_t lo = std::min(record.pos, mate.pos);
    int64_t hi = std::max(record.end_pos, mate.end_pos);
    if (spans_gene_boundary(scanner, record.tid, lo, hi))
        return false;
    return true;
}

void handle_boring_pair(Scanner &scanner, const Record &record, const Record &mate) {
    for (const Record *r : {&record, &mate})
        if (r->tid >= 0 && r->tid < (int)scanner.interesting.size() &&
            scanner.interesting[r->tid])
            scanner.boring_mapped_reads += 1;

    /* viral pristine counting (ingest loop's read-through branch) */
    if (record.tid >= 0 && record.tid < (int)scanner.viral.size() &&
        scanner.viral[record.tid]) {
        if (is_pristine_alignment(record)) scanner.viral_counts[record.tid] += 1;
        if (is_pristine_alignment(mate)) scanner.viral_counts[mate.tid] += 1;
    }

    if (!scanner.external_duplicate_marking || !(record.flag & FDUP))
        add_fragment(scanner, record, &mate, false, 0, false);
}

/* ---- full-native chimeric extraction ------------------------------------
 *
 * Exact port of the extraction loop of read_chimeric_alignments.cpp:560-773
 * plus remove_malformed_alignments (:377-506), as implemented in
 * arriba_tpu/ingest/chimeric.py (which remains the parity reference;
 * ARRIBA_TPU_NO_NATIVE=1 switches back to it). Fragments are emitted as
 * columnar arrays and materialized into Alignment objects in Python.
 */

constexpr int FREAD1 = 0x40;
constexpr int CLIP_NONE = 0, CLIP_START = 1, CLIP_END = 2;

/* the extractor works directly on the shared retained-store types so the
 * retain mode can adopt the fragment vector without a copy (extract.h) */
typedef extract_store::ExtractMate AlignmentData;
typedef extract_store::ExtractFragment FragmentData;

struct GeneSetsTid {  /* CSR sets aligned with scanner.boundaries[tid] */
    std::vector<int64_t> offsets, items;
};

struct AssemblyPlane {
    const uint8_t *seq = nullptr;
    Py_ssize_t len = 0;
};

struct Extractor {
    bool enabled = false;
    std::vector<GeneSetsTid> gene_sets;        /* per tid */
    std::vector<int64_t> gene_start, gene_end; /* per gene row */
    std::vector<AssemblyPlane> assembly;       /* per tid */
    std::vector<int64_t> tid_to_contig;        /* per tid */
    int64_t max_itd_length = 0;

    std::vector<FragmentData> fragments;
    /* sharded-sample workers: file byte offset of the record that CREATED
     * each fragment (parallel to `fragments`) — the master merges partial
     * same-name fragments from different workers in this order, which is
     * file order */
    std::vector<int64_t> fragment_first_pos;
    int64_t current_file_pos = 0;
    /* flat open-addressing name index over `fragments` (idx+1; 0=empty):
     * the std::unordered_map<string,size_t> it replaces paid a node malloc
     * per insert and a string copy per key — names already live in
     * FragmentData, so slots only store (hash, index) */
    struct NameIndex {
        std::vector<uint32_t> slots;
        std::vector<uint64_t> hashes;
        size_t mask = 0;
        size_t count = 0;
        void clear() { slots.clear(); hashes.clear(); mask = 0; count = 0; }
    } by_name;
    long mapped_reads = 0, missing_hi = 0, malformed = 0;
    bool no_chimeric = true;
    bool retain = false;
};

bool strand_fwd(const Record &record) { return !(record.flag & FREVERSE); }

/* ---- sharded-sample ingest marshalling ----------------------------------
 *
 * ARRIBA_TPU_SHARDS: worker processes each scan a byte-range slice of the
 * input (scan_sam shard_spec ("worker", start, end)) and export (a) their
 * extracted fragments and (b) their leftover unpaired collated records as
 * flat blobs; the master adopts every blob (shard_spec ("merge", ...)),
 * replays the leftovers through the exact handle_record_extract path (so
 * pairs split across range boundaries classify identically to the
 * single-process scan), and runs the normal normalize/sort/mark tail.
 * All counters are commutative sums, coverage is merged with the
 * saturating-sum rule, and the final sort-by-name fixes fragment order, so
 * the result is byte-identical to the unsharded scan. */

inline void put_u32(std::string &out, uint32_t v) {
    out.append((const char *)&v, 4);
}
inline void put_i64(std::string &out, int64_t v) {
    out.append((const char *)&v, 8);
}

struct BlobCursor {
    const char *p;
    const char *end;
    bool ok = true;
    bool pull(void *dst, size_t n) {
        if (!ok || (size_t)(end - p) < n) { ok = false; return false; }
        memcpy(dst, p, n);
        p += n;
        return true;
    }
    uint32_t u32() { uint32_t v = 0; pull(&v, 4); return v; }
    int64_t i64() { int64_t v = 0; pull(&v, 8); return v; }
    bool str(std::string &out, size_t n) {
        if (!ok || (size_t)(end - p) < n) { ok = false; return false; }
        out.assign(p, n);
        p += n;
        return true;
    }
};

void serialize_fragments(const std::vector<FragmentData> &fragments,
                         const std::vector<int64_t> &first_pos,
                         std::string &out) {
    put_i64(out, (int64_t)fragments.size());
    for (size_t fi = 0; fi < fragments.size(); ++fi) {
        const FragmentData &fragment = fragments[fi];
        put_i64(out, fi < first_pos.size() ? first_pos[fi] : 0);
        put_u32(out, (uint32_t)fragment.name.size());
        out.append(fragment.name);
        out.push_back((char)((fragment.single_end ? 1 : 0)
                             | (fragment.duplicate ? 2 : 0)));
        put_u32(out, (uint32_t)fragment.mates.size());
        for (const AlignmentData &mate : fragment.mates) {
            out.push_back((char)((mate.supplementary ? 1 : 0)
                                 | (mate.first_in_pair ? 2 : 0)
                                 | (mate.strand ? 4 : 0)
                                 | (mate.predicted_strand ? 8 : 0)
                                 | (mate.predicted_strand_ambiguous ? 16 : 0)
                                 | (mate.exonic ? 32 : 0)));
            put_i64(out, mate.contig);
            put_i64(out, mate.start);
            put_i64(out, mate.end);
            put_u32(out, (uint32_t)mate.cigar.size());
            out.append((const char *)mate.cigar.data(),
                       mate.cigar.size() * 4);
            put_u32(out, (uint32_t)mate.seq.size());
            out.append(mate.seq);
            put_u32(out, (uint32_t)mate.genes.size());
            out.append((const char *)mate.genes.data(),
                       mate.genes.size() * 8);
        }
    }
}

bool deserialize_fragments(const char *data, size_t size,
                           std::vector<FragmentData> &out,
                           std::vector<int64_t> &first_pos) {
    BlobCursor cur{data, data + size};
    int64_t n = cur.i64();
    for (int64_t i = 0; i < n && cur.ok; ++i) {
        out.emplace_back();
        FragmentData &fragment = out.back();
        first_pos.push_back(cur.i64());
        uint32_t name_len = cur.u32();
        cur.str(fragment.name, name_len);
        char flags = 0;
        cur.pull(&flags, 1);
        fragment.single_end = (flags & 1) != 0;
        fragment.duplicate = (flags & 2) != 0;
        uint32_t n_mates = cur.u32();
        for (uint32_t m = 0; m < n_mates && cur.ok; ++m) {
            fragment.mates.emplace_back();
            AlignmentData &mate = fragment.mates.back();
            char mflags = 0;
            cur.pull(&mflags, 1);
            mate.supplementary = (mflags & 1) != 0;
            mate.first_in_pair = (mflags & 2) != 0;
            mate.strand = (mflags & 4) != 0;
            mate.predicted_strand = (mflags & 8) != 0;
            mate.predicted_strand_ambiguous = (mflags & 16) != 0;
            mate.exonic = (mflags & 32) != 0;
            mate.contig = cur.i64();
            mate.start = cur.i64();
            mate.end = cur.i64();
            uint32_t n_cigar = cur.u32();
            mate.cigar.resize(n_cigar);
            cur.pull(mate.cigar.data(), (size_t)n_cigar * 4);
            uint32_t seq_len = cur.u32();
            cur.str(mate.seq, seq_len);
            uint32_t n_genes = cur.u32();
            mate.genes.resize(n_genes);
            cur.pull(mate.genes.data(), (size_t)n_genes * 8);
        }
    }
    return cur.ok;
}

void serialize_leftover(const std::string &name, const Record &record,
                        std::string &out) {
    put_u32(out, (uint32_t)name.size());
    out.append(name);
    uint16_t flag = record.flag;
    out.append((const char *)&flag, 2);
    int32_t tid = record.tid, mtid = record.mtid;
    out.append((const char *)&tid, 4);
    out.append((const char *)&mtid, 4);
    put_i64(out, record.pos);
    put_i64(out, record.end_pos);
    out.push_back((char)((record.has_sa ? 1 : 0)
                         | (record.hi_present ? 2 : 0)));
    put_i64(out, record.hi_value);
    int32_t clip = (int32_t)record.max_soft_clip;
    out.append((const char *)&clip, 4);
    put_u32(out, (uint32_t)record.cigar.size());
    out.append((const char *)record.cigar.data(), record.cigar.size() * 4);
    put_u32(out, (uint32_t)record.seq.size());
    out.append(record.seq);
    put_i64(out, record.file_pos);
}

bool deserialize_leftover(BlobCursor &cur, std::string &name,
                          Record &record) {
    uint32_t name_len = cur.u32();
    cur.str(name, name_len);
    uint16_t flag = 0;
    cur.pull(&flag, 2);
    record.flag = flag;
    int32_t tid = -1, mtid = -1;
    cur.pull(&tid, 4);
    cur.pull(&mtid, 4);
    record.tid = tid;
    record.mtid = mtid;
    record.pos = cur.i64();
    record.end_pos = cur.i64();
    char flags = 0;
    cur.pull(&flags, 1);
    record.has_sa = (flags & 1) != 0;
    record.hi_present = (flags & 2) != 0;
    record.hi_value = cur.i64();
    int32_t clip = 0;
    cur.pull(&clip, 4);
    record.max_soft_clip = clip;
    uint32_t n_cigar = cur.u32();
    record.cigar.resize(n_cigar);
    cur.pull(record.cigar.data(), (size_t)n_cigar * 4);
    uint32_t seq_len = cur.u32();
    cur.str(record.seq, seq_len);
    record.file_pos = cur.i64();
    record.line.clear();
    record.bam_body.clear();
    record.qname_len = 0;
    record.rname_start = record.rname_len = 0;
    record.seq_start = record.seq_len_span = 0;
    return cur.ok;
}


int64_t seq_length(const Record &record) {
    return record.seq == "*" ? 0 : (int64_t)record.seq.size();
}

/* htslib bam_endpos: pos+1 when no reference base is consumed */
int64_t endpos_htslib(const Record &record) {
    return record.end_pos > record.pos ? record.end_pos : record.pos + 1;
}

int64_t cigar2qlen(const std::vector<uint32_t> &cigar, int64_t n_ops) {
    int64_t length = 0;
    for (int64_t i = 0; i < n_ops && i < (int64_t)cigar.size(); ++i)
        if ((CONSUMES_QUERY >> (cigar[i] & 0xf)) & 1) length += cigar[i] >> 4;
    return length;
}

int64_t cigar2rlen(const std::vector<uint32_t> &cigar, int64_t n_ops) {
    int64_t length = 0;
    for (int64_t i = 0; i < n_ops && i < (int64_t)cigar.size(); ++i)
        if ((CONSUMES_REF >> (cigar[i] & 0xf)) & 1) length += cigar[i] >> 4;
    return length;
}

static inline uint64_t fragment_name_hash(const std::string &read_name) {
    return std::hash<std::string_view>{}(std::string_view(read_name));
}

/* fragment index + 1, or 0 when absent */
size_t fragment_lookup(const Extractor &ext, const std::string &read_name,
                       uint64_t h) {
    const Extractor::NameIndex &ni = ext.by_name;
    if (ni.mask == 0)
        return 0;
    size_t slot = (size_t)(h & ni.mask);
    while (ni.slots[slot] != 0) {
        if (ni.hashes[slot] == h &&
            ext.fragments[ni.slots[slot] - 1].name == read_name)
            return ni.slots[slot];
        slot = (slot + 1) & ni.mask;
    }
    return 0;
}

void fragment_index_insert(Extractor &ext, uint64_t h, uint32_t idx) {
    Extractor::NameIndex &ni = ext.by_name;
    if (ni.mask == 0 || (ni.count + 1) * 10 > (ni.mask + 1) * 7) {
        size_t cap = ni.mask == 0 ? 4096 : (ni.mask + 1) * 2;
        std::vector<uint32_t> old_slots(std::move(ni.slots));
        std::vector<uint64_t> old_hashes(std::move(ni.hashes));
        ni.slots.assign(cap, 0);
        ni.hashes.assign(cap, 0);
        ni.mask = cap - 1;
        for (size_t j = 0; j < old_slots.size(); ++j) {
            if (old_slots[j] == 0) continue;
            size_t slot = (size_t)(old_hashes[j] & ni.mask);
            while (ni.slots[slot] != 0) slot = (slot + 1) & ni.mask;
            ni.slots[slot] = old_slots[j];
            ni.hashes[slot] = old_hashes[j];
        }
    }
    size_t slot = (size_t)(h & ni.mask);
    while (ni.slots[slot] != 0) slot = (slot + 1) & ni.mask;
    ni.slots[slot] = idx;
    ni.hashes[slot] = h;
    ni.count += 1;
}

FragmentData &fragment_for(Extractor &ext, const std::string &read_name) {
    uint64_t h = fragment_name_hash(read_name);
    size_t idx = fragment_lookup(ext, read_name, h);
    if (idx != 0)
        return ext.fragments[idx - 1];
    fragment_index_insert(ext, h, (uint32_t)ext.fragments.size() + 1);
    ext.fragments.emplace_back();
    ext.fragments.back().name = read_name;
    ext.fragment_first_pos.push_back(ext.current_file_pos);
    return ext.fragments.back();
}

/* read_chimeric_alignments.cpp:50-91 (chimeric.py add_chimeric_alignment) */
void add_chimeric_alignment(const Extractor &ext, FragmentData &mates,
                            const Record &record, bool is_supplementary,
                            int64_t cigar_op_idx, int clip) {
    mates.single_end = !(record.flag & FPAIRED);
    mates.duplicate = mates.duplicate || (record.flag & FDUP);
    mates.mates.emplace_back();
    AlignmentData &alignment = mates.mates.back();
    alignment.strand = strand_fwd(record);
    alignment.first_in_pair = (record.flag & FREAD1) != 0;
    alignment.contig = (record.tid >= 0 && record.tid < (int)ext.tid_to_contig.size())
                           ? ext.tid_to_contig[record.tid] : record.tid;
    alignment.supplementary = is_supplementary;
    if (!is_supplementary && record.seq != "*")
        alignment.seq = record.seq;

    const std::vector<uint32_t> &cigar = record.cigar;
    if (clip == CLIP_START) {
        alignment.start = record.pos + cigar2rlen(cigar, cigar_op_idx);
        alignment.end = endpos_htslib(record) - 1;
        uint32_t clip_type = (!cigar.empty() && (cigar[0] & 0xf) == CHARD_CLIP)
                                 ? CHARD_CLIP : CSOFT_CLIP;
        alignment.cigar.clear();
        alignment.cigar.push_back(
            ((uint32_t)cigar2qlen(cigar, cigar_op_idx) << 4) | clip_type);
        alignment.cigar.insert(alignment.cigar.end(), cigar.begin() + cigar_op_idx,
                               cigar.end());
    } else if (clip == CLIP_END) {
        alignment.start = record.pos;
        alignment.end = record.pos + cigar2rlen(cigar, cigar_op_idx + 1) - 1;
        uint32_t clip_type = (!cigar.empty() && (cigar.back() & 0xf) == CHARD_CLIP)
                                 ? CHARD_CLIP : CSOFT_CLIP;
        alignment.cigar.assign(cigar.begin(), cigar.begin() + cigar_op_idx + 1);
        alignment.cigar.push_back(
            ((uint32_t)(seq_length(record) - cigar2qlen(cigar, cigar_op_idx + 1)) << 4)
            | clip_type);
    } else {
        alignment.start = record.pos;
        alignment.end = endpos_htslib(record) - 1;
        alignment.cigar = cigar;
    }
}

/* read_chimeric_alignments.cpp:511-522 */
bool is_clipped_at_correct_end(const Record &record) {
    if (!(record.flag & FPAIRED))
        return true;
    if (record.cigar.empty())
        return false;
    size_t clipped_end;
    if (record.flag & FSUPPLEMENTARY)
        clipped_end = strand_fwd(record) ? record.cigar.size() - 1 : 0;
    else
        clipped_end = strand_fwd(record) ? 0 : record.cigar.size() - 1;
    uint32_t op = record.cigar[clipped_end] & 0xf;
    return op == CSOFT_CLIP || op == CHARD_CLIP;
}

/* read_chimeric_alignments.cpp:197-211 */
bool clipped_sequence_is_adapter(const Record *mate1, const Record *mate2) {
    if (mate1 == nullptr || mate2 == nullptr)
        return false;
    if (mate1->pos != mate2->pos)
        return false;
    if (!strand_fwd(*mate1) && !mate1->cigar.empty() &&
        (mate1->cigar.front() & 0xf) == CSOFT_CLIP && strand_fwd(*mate2) &&
        !mate2->cigar.empty() && (mate2->cigar.back() & 0xf) == CSOFT_CLIP &&
        (mate1->cigar.front() >> 4) == (mate2->cigar.back() >> 4))
        return true;
    if (!strand_fwd(*mate2) && !mate2->cigar.empty() &&
        (mate2->cigar.front() & 0xf) == CSOFT_CLIP && strand_fwd(*mate1) &&
        !mate1->cigar.empty() && (mate1->cigar.back() & 0xf) == CSOFT_CLIP &&
        (mate2->cigar.front() >> 4) == (mate1->cigar.back() >> 4))
        return true;
    return false;
}

/* gene interval index point query (annotation.t.hpp:61-68) */
void gene_point_query(const Scanner &scanner, const Extractor &ext, int32_t tid,
                      int64_t pos, std::vector<int64_t> &out) {
    out.clear();
    if (tid < 0 || tid >= (int)scanner.boundaries.size())
        return;
    const std::vector<int64_t> &bounds = scanner.boundaries[tid];
    auto it = std::lower_bound(bounds.begin(), bounds.end(), pos);
    if (it == bounds.end())
        return;
    size_t idx = it - bounds.begin();
    const GeneSetsTid &sets = ext.gene_sets[tid];
    if (idx + 1 >= sets.offsets.size())
        return;
    out.assign(sets.items.begin() + sets.offsets[idx],
               sets.items.begin() + sets.offsets[idx + 1]);
}

/* read_chimeric_alignments.cpp:19-41 */
bool find_spanning_intron(const Record &record, int64_t gene1_end,
                          int64_t gene2_start, int64_t &cigar_op_idx,
                          int64_t &read_pos) {
    if (record.cigar.size() < 3)
        return false;
    int64_t before = record.pos;
    for (size_t i = 0; i < record.cigar.size(); ++i) {
        uint32_t word = record.cigar[i];
        uint32_t op = word & 0xf;
        int64_t op_length = ((CONSUMES_REF >> op) & 1) ? (word >> 4) : 0;
        int64_t after = before + op_length;
        if (op == CREF_SKIP &&
            ((before <= gene1_end && gene1_end < after) ||
             (before < gene2_start && gene2_start <= after))) {
            cigar_op_idx = (int64_t)i;
            read_pos = cigar2qlen(record.cigar, (int64_t)i);
            return true;
        }
        before = after;
    }
    return false;
}

/* read_chimeric_alignments.cpp:93-193 (chimeric.py extract_read_through_alignment) */
bool extract_read_through_alignment(Scanner &scanner, Extractor &ext,
                                    const std::string &read_name,
                                    const Record *forward_mate,
                                    const Record *reverse_mate) {
    if (forward_mate != nullptr && !strand_fwd(*forward_mate))
        std::swap(forward_mate, reverse_mate);

    std::vector<int64_t> forward_genes, reverse_genes;
    if (forward_mate != nullptr)
        gene_point_query(scanner, ext, forward_mate->tid, forward_mate->pos, forward_genes);
    else
        gene_point_query(scanner, ext, reverse_mate->tid, reverse_mate->pos, forward_genes);
    if (reverse_mate != nullptr)
        gene_point_query(scanner, ext, reverse_mate->tid, endpos_htslib(*reverse_mate), reverse_genes);
    else
        gene_point_query(scanner, ext, forward_mate->tid, endpos_htslib(*forward_mate), reverse_genes);

    std::vector<int64_t> common_genes;  /* intersection only (make_union=False) */
    std::set_intersection(forward_genes.begin(), forward_genes.end(),
                          reverse_genes.begin(), reverse_genes.end(),
                          std::back_inserter(common_genes));
    if (!common_genes.empty() || (forward_genes.empty() && reverse_genes.empty()))
        return false;

    /* boundaries of the biggest overlapped genes (annotation.cpp:558-567) */
    int64_t forward_gene_start = -1, forward_gene_end = -1;
    int64_t reverse_gene_start = -1, reverse_gene_end = -1;
    for (int64_t g : forward_genes) {
        if (forward_gene_start == -1 || ext.gene_start[g] < forward_gene_start)
            forward_gene_start = ext.gene_start[g];
        if (ext.gene_end[g] > forward_gene_end) forward_gene_end = ext.gene_end[g];
    }
    for (int64_t g : reverse_genes) {
        if (reverse_gene_start == -1 || ext.gene_start[g] < reverse_gene_start)
            reverse_gene_start = ext.gene_start[g];
        if (ext.gene_end[g] > reverse_gene_end) reverse_gene_end = ext.gene_end[g];
    }
    if (forward_genes.empty()) { forward_gene_start = -1; forward_gene_end = -1; }
    if (reverse_genes.empty()) { reverse_gene_start = -1; reverse_gene_end = -1; }
    if (forward_gene_end == -1) forward_gene_end = reverse_gene_start - 1;
    if (reverse_gene_start == -1) reverse_gene_start = forward_gene_end + 1;

    int64_t fwd_op = 0, fwd_read_pos = 0, rev_op = 0, rev_read_pos = 0;
    bool fwd_has_intron = forward_mate != nullptr &&
        find_spanning_intron(*forward_mate, forward_gene_end, reverse_gene_start,
                             fwd_op, fwd_read_pos);
    bool rev_has_intron = reverse_mate != nullptr &&
        find_spanning_intron(*reverse_mate, forward_gene_end, reverse_gene_start,
                             rev_op, rev_read_pos);

    if (fwd_has_intron &&
        (!rev_has_intron || fwd_read_pos < seq_length(*reverse_mate) - rev_read_pos)) {
        if (fragment_lookup(ext, read_name,
                            fragment_name_hash(read_name)) == 0) {
            FragmentData &mates = fragment_for(ext, read_name);
            add_chimeric_alignment(ext, mates, *forward_mate, false, fwd_op + 1, CLIP_START);
            add_chimeric_alignment(ext, mates, *forward_mate, true, fwd_op - 1, CLIP_END);
            if (reverse_mate != nullptr) {
                if (rev_has_intron)
                    add_chimeric_alignment(ext, mates, *reverse_mate, false, rev_op + 1, CLIP_START);
                else
                    add_chimeric_alignment(ext, mates, *reverse_mate, false, 0, CLIP_NONE);
            }
            return true;
        }
    } else if (rev_has_intron) {
        if (fragment_lookup(ext, read_name,
                            fragment_name_hash(read_name)) == 0) {
            FragmentData &mates = fragment_for(ext, read_name);
            add_chimeric_alignment(ext, mates, *reverse_mate, true, rev_op + 1, CLIP_START);
            add_chimeric_alignment(ext, mates, *reverse_mate, false, rev_op - 1, CLIP_END);
            if (forward_mate != nullptr) {
                if (fwd_has_intron)
                    add_chimeric_alignment(ext, mates, *forward_mate, false, fwd_op - 1, CLIP_END);
                else
                    add_chimeric_alignment(ext, mates, *forward_mate, false, 0, CLIP_NONE);
            }
            return true;
        }
    } else if (forward_mate != nullptr && reverse_mate != nullptr &&
               reverse_mate->pos >= reverse_gene_start &&
               endpos_htslib(*forward_mate) <= forward_gene_end) {
        if (fragment_lookup(ext, read_name,
                            fragment_name_hash(read_name)) == 0) {
            FragmentData &mates = fragment_for(ext, read_name);
            add_chimeric_alignment(ext, mates, *forward_mate, false, 0, CLIP_NONE);
            add_chimeric_alignment(ext, mates, *reverse_mate, false, 0, CLIP_NONE);
        }
        return true;
    }

    return false;
}

/* brute-force ITD window scan shared by the Python binding and the extractor */
bool tandem_scan_core(const uint8_t *clipped, int64_t clipped_len,
                      const uint8_t *contig_seq, int64_t contig_len,
                      int64_t window_start, int64_t window_end, int direction,
                      int64_t &out_pos, int64_t &out_start, int64_t &out_end) {
    const int max_non_template_bases = 6, max_mismatches = 1,
              min_alignment_length = 15;
    for (int64_t contig_pos = window_start; contig_pos <= window_end; ++contig_pos) {
        if (contig_pos < 0 || contig_pos + clipped_len > contig_len)
            continue;
        const uint8_t *window = contig_seq + contig_pos;
        int64_t matches = 0, mismatches = 0;
        int64_t aln_start = contig_len, aln_end = -1;
        for (int64_t i = 0; i < clipped_len; ++i) {
            int64_t read_pos = (direction == 1) ? i : clipped_len - 1 - i;
            if (window[read_pos] == clipped[read_pos]) {
                matches += 1;
                if (contig_pos + read_pos < aln_start) aln_start = contig_pos + read_pos;
                if (contig_pos + read_pos > aln_end) aln_end = contig_pos + read_pos;
            } else if (i >= max_non_template_bases) {
                mismatches += 1;
                if (mismatches > max_mismatches)
                    break;
            }
        }
        if (matches >= min_alignment_length || matches + mismatches == clipped_len) {
            out_pos = contig_pos;
            out_start = aln_start;
            out_end = aln_end;
            return true;
        }
    }
    return false;
}

/* read_chimeric_alignments.cpp:215-336 (chimeric.py is_tandem_duplication) */
bool is_tandem_duplication(const Extractor &ext, const Record *record,
                           AlignmentData &tandem) {
    const int64_t min_clipped_length = 12, min_duplication_length = 9;
    const int64_t max_duplication_length = ext.max_itd_length;

    if (record == nullptr || record->cigar.empty())
        return false;

    int64_t clipped_len = 0, clipped_pos = 0;
    bool clipped_start = true;
    int direction = 1;
    int64_t window_start = 0, window_end = 0, extended_read_start = 0;
    uint32_t first = record->cigar.front(), last = record->cigar.back();
    int64_t l_qseq = seq_length(*record);
    if ((first & 0xf) == CSOFT_CLIP && (int64_t)(first >> 4) >= min_clipped_length) {
        clipped_len = first >> 4;
        clipped_pos = 0;
        direction = -1;
        window_start = record->pos + min_duplication_length - clipped_len;
        window_end = record->pos + max_duplication_length - clipped_len;
        extended_read_start = record->pos - clipped_len;
        clipped_start = true;
    }
    if ((last & 0xf) == CSOFT_CLIP &&
        (int64_t)(last >> 4) >= std::max(min_clipped_length, clipped_len)) {
        clipped_len = last >> 4;
        clipped_pos = l_qseq - clipped_len;
        direction = 1;
        window_start = endpos_htslib(*record) - max_duplication_length;
        window_end = endpos_htslib(*record) - min_duplication_length;
        extended_read_start = endpos_htslib(*record);
        clipped_start = false;
    }
    if (clipped_len == 0)
        return false;

    if (record->tid < 0 || record->tid >= (int)ext.assembly.size() ||
        ext.assembly[record->tid].seq == nullptr)
        return false;
    const AssemblyPlane &plane = ext.assembly[record->tid];
    if (window_end + max_duplication_length + clipped_len + 1 >= plane.len ||
        window_start <= max_duplication_length + clipped_len + 1)
        return false;
    if (clipped_pos < 0 || clipped_pos + clipped_len > l_qseq)
        return false;  /* malformed seq: the reference would misbehave here */

    const uint8_t *clipped = (const uint8_t *)record->seq.data() + clipped_pos;

    /* premature-clipping check: does the clipped segment extend linearly? */
    {
        int64_t lo = extended_read_start;
        int64_t pad_left = lo < 0 ? -lo : 0;
        int64_t usable = clipped_len - pad_left;
        if (lo + clipped_len > plane.len) usable = plane.len - std::max(lo, (int64_t)0);
        int64_t matches = 0;
        for (int64_t i = 0; i < usable; ++i)
            if (plane.seq[std::max(lo, (int64_t)0) + i] == clipped[pad_left + i])
                matches += 1;
        if ((double)matches / (double)clipped_len >= 0.7)
            return false;
    }

    int64_t contig_pos, aln_start, aln_end;
    if (!tandem_scan_core(clipped, clipped_len, plane.seq, plane.len, window_start,
                          window_end, direction, contig_pos, aln_start, aln_end))
        return false;

    tandem = AlignmentData();
    tandem.start = aln_start;
    tandem.end = aln_end;
    tandem.strand = strand_fwd(*record);
    tandem.first_in_pair = (record->flag & FREAD1) != 0;
    tandem.contig = (record->tid >= 0 && record->tid < (int)ext.tid_to_contig.size())
                        ? ext.tid_to_contig[record->tid] : record->tid;
    tandem.supplementary = !(record->flag & FPAIRED) ||
                           (clipped_start && strand_fwd(*record)) ||
                           (!clipped_start && !strand_fwd(*record));
    if (!tandem.supplementary && record->seq != "*")
        tandem.seq = record->seq;
    int64_t clip_left = clipped_start ? 0 : l_qseq - clipped_len;
    int64_t clip_right = clipped_start ? l_qseq - clipped_len : 0;
    if (aln_start > contig_pos) clip_left += aln_start - contig_pos;
    if (aln_end < contig_pos + clipped_len - 1)
        clip_right += contig_pos + clipped_len - 1 - aln_end;
    tandem.cigar.clear();
    if (clip_left > 0) tandem.cigar.push_back(((uint32_t)clip_left << 4) | CSOFT_CLIP);
    tandem.cigar.push_back(((uint32_t)(aln_end - aln_start + 1) << 4) | CMATCH);
    if (clip_right > 0) tandem.cigar.push_back(((uint32_t)clip_right << 4) | CSOFT_CLIP);
    return true;
}

/* the record/pair extraction block of the ingest loop
 * (read_chimeric_alignments.cpp:676-771, chimeric.py:678-720) */
void handle_extract_pair(Scanner &scanner, Extractor &ext,
                         const std::string &read_name, Record &record,
                         Record *previously_seen_mate) {
    bool is_tandem_alignment = false;
    AlignmentData tandem;
    bool have_tandem = false;
    if (!clipped_sequence_is_adapter(&record, previously_seen_mate) &&
        (previously_seen_mate == nullptr ||
         strand_fwd(record) != strand_fwd(*previously_seen_mate))) {
        have_tandem = is_tandem_duplication(ext, &record, tandem);
        if (!have_tandem)
            have_tandem = is_tandem_duplication(ext, previously_seen_mate, tandem);
    }
    if (have_tandem) {
        FragmentData &mates = fragment_for(ext, read_name + "ITD");
        add_chimeric_alignment(ext, mates, record,
                               strand_fwd(record) == tandem.strand &&
                                   !tandem.supplementary,
                               0, CLIP_NONE);
        if (previously_seen_mate != nullptr)
            add_chimeric_alignment(ext, mates, *previously_seen_mate,
                                   strand_fwd(*previously_seen_mate) == tandem.strand &&
                                       !tandem.supplementary,
                                   0, CLIP_NONE);
        mates.single_end = !(record.flag & FPAIRED);
        mates.mates.push_back(tandem);
        is_tandem_alignment = true;
    }

    bool is_read_through_alignment = false;
    if ((record.has_sa && is_clipped_at_correct_end(record)) ||
        (previously_seen_mate != nullptr && previously_seen_mate->has_sa &&
         is_clipped_at_correct_end(*previously_seen_mate))) {
        FragmentData &mates = fragment_for(ext, read_name);
        add_chimeric_alignment(ext, mates, record, false, 0, CLIP_NONE);
        if (previously_seen_mate != nullptr)
            add_chimeric_alignment(ext, mates, *previously_seen_mate, false, 0, CLIP_NONE);
        ext.no_chimeric = false;
    } else if (!is_tandem_alignment) {
        is_read_through_alignment = extract_read_through_alignment(
            scanner, ext, read_name, &record, previously_seen_mate);
        if (record.tid >= 0 && record.tid < (int)scanner.viral.size() &&
            scanner.viral[record.tid]) {
            if (is_pristine_alignment(record))
                scanner.viral_counts[record.tid] += 1;
            if (previously_seen_mate != nullptr &&
                is_pristine_alignment(*previously_seen_mate))
                scanner.viral_counts[previously_seen_mate->tid] += 1;
        }
    }

    if (!scanner.external_duplicate_marking || !(record.flag & FDUP))
        add_fragment(scanner, record, previously_seen_mate,
                     is_read_through_alignment, 0, false);
}

void append_int(std::string &out, long long value);

/* the extraction loop, chimeric.py:617-720 — one record against the given
 * scanner/extractor state. Thread-safe when each (scanner, extractor) pair is
 * private to a shard and scanner.atomic_coverage guards the shared planes;
 * all records of one read name must go to the same shard (mate collation,
 * supplementary joins and ITD fragments key on the name). */
/* fine-grained handle-phase breakdown under ARRIBA_TPU_SCAN_TIMING=2 */
static bool g_handle_timing = false;
static thread_local uint64_t g_t_name, g_t_pend, g_t_boring, g_t_cov,
    g_t_chim, g_n_pairs, g_n_pend_hit, g_t_consume, g_n_consumed,
    g_t_parse_only;
static inline uint64_t handle_tsc() {
#if defined(__x86_64__)
    unsigned lo, hi;
    __asm__ volatile("rdtsc" : "=a"(lo), "=d"(hi));
    return ((uint64_t)hi << 32) | lo;
#else
    return 0;
#endif
}

void handle_record_extract(Scanner &scanner, Extractor &extractor,
                           Record &record, std::string_view qname) {
    scanner.n_records += 1;
    extractor.current_file_pos = record.file_pos;

    if ((record.flag & FUNMAP) ||
        ((record.flag & FPAIRED) && (record.flag & FMUNMAP)))
        return;
    if (record.tid < 0) {
        /* mapped flag but no usable RNAME ('*' or unknown): the reference
         * indexes its contig map out of bounds here (UB); malformed */
        extractor.malformed += 1;
        return;
    }

    long long hit_index = 1;
    if (record.hi_present) {
        hit_index = record.hi_value;
    } else if (record.flag & FSECONDARY) {
        extractor.missing_hi += 1;
        return;
    }
    uint64_t ht0 = g_handle_timing ? handle_tsc() : 0;
    /* the "qname,HI" key string is only materialized for records that reach
     * the chimeric extract path (~1-10% of a typical sample); collation of
     * the boring majority keys on the (qname view, HI) pair directly */
    auto build_name = [&]() -> std::string & {
        std::string &read_name = scanner.name_scratch;
        read_name.assign(qname.data(), qname.size());
        read_name += ',';
        append_int(read_name, hit_index);
        return read_name;
    };

    if (record.seq == "*")
        record.seq.clear();
    if (g_handle_timing) { uint64_t t = handle_tsc(); g_t_name += t - ht0; ht0 = t; }

    if (record.flag & FSUPPLEMENTARY) {
        if (is_clipped_at_correct_end(record))
            add_chimeric_alignment(extractor,
                                   fragment_for(extractor, build_name()),
                                   record, true, 0, CLIP_NONE);
        else
            extractor.malformed += 1;
        extractor.no_chimeric = false;
        return;
    }

    if (record.tid >= 0 && record.tid < (int)scanner.interesting.size() &&
        scanner.interesting[record.tid])
        extractor.mapped_reads += 1;

    if ((record.flag & FPAIRED) && !(record.flag & FPROPER_PAIR)) {
        add_chimeric_alignment(extractor,
                               fragment_for(extractor, build_name()),
                               record, false, 0, CLIP_NONE);
        extractor.no_chimeric = false;
        if (!scanner.external_duplicate_marking || !(record.flag & FDUP))
            /* the reference clears ALL flags here
             * (read_chimeric_alignments.cpp:664) */
            add_fragment(scanner, record, nullptr, true, 0, true);
        return;
    }

    if (record.flag & FPAIRED) {
        /* the mate stays where it lives (pending slot or collator pool
         * entry) — no per-pair Record moves, so the decoded[] batch slots
         * keep their recycled heap buffers */
        Record *mate_slot;
        uint32_t pool_idx = 0;
        if (scanner.has_pending && scanner.pending_hit == hit_index &&
            std::string_view(scanner.pending_name) == qname) {
            scanner.has_pending = false;
            mate_slot = &scanner.pending;
            if (g_handle_timing) {
                uint64_t t = handle_tsc();
                g_t_pend += t - ht0; ht0 = t; g_n_pend_hit += 1;
            }
        } else {
            /* probe the spill table only when it has entries: with
             * mate-adjacent input (STAR's layout) it stays empty and first
             * mates go straight to the pending slot, no hash computed */
            if (scanner.coll.count != 0) {
                uint64_t h = std::hash<std::string_view>{}(qname) * 1000003u
                             + (uint64_t)hit_index;
                pool_idx = scanner.coll.find_extract(h, qname, hit_index);
            }
            if (pool_idx == 0) {
                if (scanner.has_pending) {
                    uint64_t hp = std::hash<std::string_view>{}(
                                      std::string_view(scanner.pending_name))
                                  * 1000003u + (uint64_t)scanner.pending_hit;
                    scanner.coll.insert(hp, scanner.pending_name,
                                        scanner.pending_hit,
                                        scanner.pending);
                }
                scanner.pending_name.assign(qname.data(), qname.size());
                scanner.pending_hit = hit_index;
                record_swap(scanner.pending, record);
                scanner.has_pending = true;
                if (g_handle_timing) g_t_pend += handle_tsc() - ht0;
                return;
            }
            mate_slot = &scanner.coll.pool[pool_idx - 1].rec;
            if (g_handle_timing) {
                uint64_t t = handle_tsc();
                g_t_pend += t - ht0; ht0 = t;
            }
        }
        Record &mate = *mate_slot;
        bool boring = pair_is_boring(scanner, record, mate);
        if (g_handle_timing) {
            uint64_t t = handle_tsc();
            g_t_boring += t - ht0; ht0 = t; g_n_pairs += 1;
        }
        if (boring) {
            /* mapped reads already counted at arrival; coverage + viral */
            if (record.tid >= 0 && record.tid < (int)scanner.viral.size() &&
                scanner.viral[record.tid]) {
                if (is_pristine_alignment(record))
                    scanner.viral_counts[record.tid] += 1;
                if (is_pristine_alignment(mate))
                    scanner.viral_counts[mate.tid] += 1;
            }
            if (!scanner.external_duplicate_marking || !(record.flag & FDUP))
                add_fragment(scanner, record, &mate, false, 0, false);
            if (g_handle_timing) g_t_cov += handle_tsc() - ht0;
        } else {
            handle_extract_pair(scanner, extractor, build_name(), record,
                                &mate);
            if (g_handle_timing) g_t_chim += handle_tsc() - ht0;
        }
        if (pool_idx != 0)
            scanner.coll.release(pool_idx);
    } else {
        handle_extract_pair(scanner, extractor, build_name(), record,
                            nullptr);
    }
}

/* materialize a lazily-parsed sequence from its line span ("*" spans stay
 * empty — the handle path's seq=="*" clear collapses to the same state) */
static inline void ensure_seq(Record &record, const char *line) {
    if (!record.seq.empty() || record.seq_len_span == 0)
        return;
    if (record.seq_len_span == 1 && line[record.seq_start] == '*')
        return;
    record.seq.assign(line + record.seq_start, record.seq_len_span);
}

/* Consume two adjacent records as one boring proper pair entirely in the
 * parse phase: the overwhelming majority of records in aligner output are
 * mate-adjacent proper pairs that never touch the chimeric extract path, so
 * handling them here skips the shard partition, the per-shard handle loop,
 * and the pending-slot store. Every side effect (n_records, mapped_reads,
 * viral pristine counts, coverage walk) is a commutative reduction into the
 * calling worker's private scanner/extractor, so the merged result is
 * byte-identical to routing both records through handle_record_extract.
 * Only valid-SAM inputs are consumed (exactly two primary proper-pair
 * records per (QNAME, HI)); everything else falls through to the exact
 * handle path. Returns true when the pair was consumed. */
bool consume_adjacent_boring_pair(Scanner &sc, Extractor &ex,
                                  Record &r1, Record &r2,
                                  std::string_view qname1,
                                  std::string_view qname2) {
    const uint16_t bad = FUNMAP | FMUNMAP | FSECONDARY | FSUPPLEMENTARY;
    const uint16_t need = FPAIRED | FPROPER_PAIR;
    if ((r1.flag & bad) || (r2.flag & bad))
        return false;
    if (r1.tid < 0 || r2.tid < 0)
        return false;  /* unresolved RNAME: the handle path counts it malformed */
    if ((r1.flag & need) != need || (r2.flag & need) != need)
        return false;
    if (qname1 != qname2)
        return false;
    long long hit1 = r1.hi_present ? r1.hi_value : 1;
    long long hit2 = r2.hi_present ? r2.hi_value : 1;
    if (hit1 != hit2)
        return false;
    /* same predicate and argument order as the handle path (record = the
     * later arrival r2, mate = r1) */
    if (!pair_is_boring(sc, r2, r1))
        return false;
    sc.n_records += 2;
    for (const Record *r : {&r1, &r2})
        if (r->tid >= 0 && r->tid < (int)sc.interesting.size() &&
            sc.interesting[r->tid])
            ex.mapped_reads += 1;
    if (r1.seq == "*") r1.seq.clear();
    if (r2.seq == "*") r2.seq.clear();
    if (r2.tid >= 0 && r2.tid < (int)sc.viral.size() && sc.viral[r2.tid]) {
        ensure_seq(r1, qname1.data());
        ensure_seq(r2, qname2.data());
        if (is_pristine_alignment(r2)) sc.viral_counts[r2.tid] += 1;
        if (is_pristine_alignment(r1)) sc.viral_counts[r1.tid] += 1;
    }
    if (!sc.external_duplicate_marking || !(r2.flag & FDUP))
        add_fragment(sc, r2, &r1, false, 0, false);
    return true;
}

/* read_chimeric_alignments.cpp:340-373 (chimeric.py disjoin_split_read_segments) */
bool disjoin_split_read_segments(AlignmentData &split_read, AlignmentData &supplementary) {
    const int64_t min_remaining = 10;
    int64_t clipped_split = split_read.strand ? split_read.preclipping()
                                                      : split_read.postclipping();
    int64_t clipped_supp = supplementary.strand ? supplementary.postclipping()
                                                        : supplementary.preclipping();
    int64_t overlap = (int64_t)split_read.seq.size() - clipped_split - clipped_supp;
    if (overlap <= 0)
        return true;

    int64_t clipped_idx = supplementary.strand
                              ? (int64_t)supplementary.cigar.size() - 1 : 0;
    int64_t matching_idx = supplementary.strand ? clipped_idx - 1 : 1;
    if (supplementary.cigar.size() < 2 ||
        (supplementary.cigar[matching_idx] & 0xf) != CMATCH ||
        (int64_t)(supplementary.cigar[matching_idx] >> 4) < overlap + min_remaining)
        return false;

    supplementary.cigar[clipped_idx] =
        (uint32_t)(((supplementary.cigar[clipped_idx] >> 4) + overlap) << 4) |
        (supplementary.cigar[clipped_idx] & 0xf);
    supplementary.cigar[matching_idx] =
        (uint32_t)(((supplementary.cigar[matching_idx] >> 4) - overlap) << 4) |
        (supplementary.cigar[matching_idx] & 0xf);
    if (supplementary.strand)
        supplementary.end -= overlap;
    else
        supplementary.start += overlap;
    return true;
}

void to_soft_clip(std::vector<uint32_t> &cigar, size_t idx) {
    cigar[idx] = ((cigar[idx] >> 4) << 4) | CSOFT_CLIP;
}

bool complement_strand_if(bool strand, bool condition) {
    return condition ? !strand : strand;
}

/* read_chimeric_alignments.cpp:377-506 (chimeric.py _normalize_fragment) */
bool normalize_fragment(FragmentData &fragment) {
    std::vector<AlignmentData> &mates = fragment.mates;
    const int MATE1 = 0, MATE2 = 1, SPLIT = 1, SUPP = 2;

    if (fragment.single_end) {
        if (!(mates.size() == 2 && mates[MATE1].supplementary != mates[MATE2].supplementary))
            return false;
        /* simulate paired-end: shorter anchor becomes SUPPLEMENTARY, longer
         * becomes SPLIT_READ, MATE1 is a copy of the split read */
        if (mates[MATE1].end - mates[MATE1].start > mates[MATE2].end - mates[MATE2].start) {
            AlignmentData supplementary = mates[MATE2];
            mates[MATE2] = mates[MATE1];
            mates.push_back(supplementary);
        } else {
            AlignmentData supplementary = mates[MATE1];
            mates[MATE1] = mates[MATE2];
            mates.push_back(supplementary);
        }

        if (!mates[MATE1].supplementary)
            mates[SPLIT].seq = mates[MATE1].seq;
        else if (!mates[SPLIT].supplementary)
            mates[MATE1].seq = mates[SPLIT].seq;
        else {
            mates[MATE1].seq = mates[SUPP].seq;
            mates[SPLIT].seq = mates[SUPP].seq;
        }
        mates[SUPP].seq.clear();

        for (int m : {MATE1, SPLIT}) {
            if (!mates[m].cigar.empty()) {
                if ((mates[m].cigar.front() & 0xf) == CHARD_CLIP)
                    to_soft_clip(mates[m].cigar, 0);
                if ((mates[m].cigar.back() & 0xf) == CHARD_CLIP)
                    to_soft_clip(mates[m].cigar, mates[m].cigar.size() - 1);
            }
        }

        mates[SUPP].supplementary = true;
        mates[MATE1].supplementary = false;
        mates[SPLIT].supplementary = false;

        AlignmentData &split = mates[SPLIT];
        AlignmentData &supp = mates[SUPP];
        bool same_strand = split.strand == supp.strand;
        int64_t left_anchor = (int64_t)split.seq.size() - split.preclipping() -
                              (same_strand ? supp.postclipping() : supp.preclipping());
        int64_t right_anchor = (int64_t)split.seq.size() - split.postclipping() -
                               (same_strand ? supp.preclipping() : supp.postclipping());
        bool flip_mate1_strand = left_anchor < right_anchor ? split.strand
                                                            : !split.strand;
        mates[MATE1].strand =
            complement_strand_if(mates[MATE1].strand, flip_mate1_strand);
        mates[SPLIT].strand =
            complement_strand_if(mates[SPLIT].strand, !flip_mate1_strand);
        mates[SUPP].strand =
            complement_strand_if(mates[SUPP].strand, !flip_mate1_strand);

        mates[MATE1].first_in_pair = !flip_mate1_strand;
        mates[SPLIT].first_in_pair = flip_mate1_strand;
        mates[SUPP].first_in_pair = flip_mate1_strand;

        if (!disjoin_split_read_segments(mates[SPLIT], mates[SUPP]))
            return false;
    } else {  /* paired-end */
        if (mates.size() == 3) {
            if (mates[MATE1].supplementary)
                std::swap(mates[MATE1], mates[SUPP]);
            else if (mates[MATE2].supplementary)
                std::swap(mates[MATE2], mates[SUPP]);
            if (mates[SPLIT].first_in_pair != mates[SUPP].first_in_pair)
                std::swap(mates[MATE1], mates[MATE2]);
            if (mates[MATE1].supplementary || mates[SPLIT].supplementary ||
                !mates[SUPP].supplementary)
                return false;
            if (mates[MATE1].contig != mates[SPLIT].contig ||
                mates[MATE1].strand == mates[SPLIT].strand)
                return false;
            if (!disjoin_split_read_segments(mates[SPLIT], mates[SUPP]))
                return false;
        } else if (mates.size() == 2) {
            if (mates[MATE1].supplementary || mates[MATE2].supplementary)
                return false;
        } else {
            return false;
        }
    }

    for (int m : {MATE1, MATE2}) {
        if (mates[m].cigar.empty())
            return false;
        if ((mates[m].cigar.front() & 0xf) == CHARD_CLIP ||
            (mates[m].cigar.back() & 0xf) == CHARD_CLIP)
            return false;
    }
    return true;
}

/* ---- SAM text parsing --------------------------------------------------- */

/* pointer-slice SAM parser: `data` need not be NUL-terminated at data+n
 * (numeric fields always end at a tab/newline/NUL within the enclosing
 * buffer, which terminates the digit loops) */

/* plain digit loops instead of atoi/atoll: the libc converters are
 * locale-aware and cost ~70 ns/line on the 11-field hot path (measured:
 * field decode 98 -> 35 ns/line on the bench sample). SAM numeric fields
 * are plain decimal integers terminated by tab/newline. */
static inline int64_t sam_parse_uint(const char *p, const char *end) {
    int64_t value = 0;
    while (p < end && *p >= '0' && *p <= '9')
        value = value * 10 + (*p++ - '0');
    return value;
}
static inline int64_t sam_parse_int(const char *p, const char *end) {
    if (p < end && *p == '-') return -sam_parse_uint(p + 1, end);
    if (p < end && *p == '+') ++p;
    return sam_parse_uint(p, end);
}
/* one-pass field splitter: collect every tab offset of the line with an
 * AVX2 sweep (32 bytes / iteration, one compare + movemask) instead of a
 * memchr call per field; falls back to memchr on non-AVX2 hosts */
#if defined(__x86_64__) || defined(__i386__)
#include <immintrin.h>
__attribute__((target("avx2")))
static int collect_tabs_avx2(const char *data, size_t n, uint32_t *tabs,
                             int max_tabs) {
    int count = 0;
    const __m256i needle = _mm256_set1_epi8('\t');
    size_t i = 0;
    for (; i + 32 <= n; i += 32) {
        __m256i chunk =
            _mm256_loadu_si256((const __m256i *)(data + i));
        uint32_t mask = (uint32_t)_mm256_movemask_epi8(
            _mm256_cmpeq_epi8(chunk, needle));
        while (mask) {
            if (count >= max_tabs) return -1;  /* caller falls back */
            tabs[count++] = (uint32_t)(i + (unsigned)__builtin_ctz(mask));
            mask &= mask - 1;
        }
    }
    for (; i < n; ++i)
        if (data[i] == '\t') {
            if (count >= max_tabs) return -1;
            tabs[count++] = (uint32_t)i;
        }
    return count;
}
static bool cpu_has_avx2() {
    static const bool result = __builtin_cpu_supports("avx2");
    return result;
}
/* invoke `cut` with the offset of every newline in data[0, n) ascending */
template <typename Cut>
__attribute__((target("avx2")))
static void newline_sweep_avx2(const char *data, size_t n, Cut &&cut) {
    const __m256i needle = _mm256_set1_epi8('\n');
    size_t i = 0;
    for (; i + 32 <= n; i += 32) {
        __m256i chunk = _mm256_loadu_si256((const __m256i *)(data + i));
        uint32_t mask = (uint32_t)_mm256_movemask_epi8(
            _mm256_cmpeq_epi8(chunk, needle));
        while (mask) {
            cut(i + (unsigned)__builtin_ctz(mask));
            mask &= mask - 1;
        }
    }
    for (; i < n; ++i)
        if (data[i] == '\n') cut(i);
}
#else
static int collect_tabs_avx2(const char *, size_t, uint32_t *, int) {
    return -1;
}
static bool cpu_has_avx2() { return false; }
template <typename Cut>
static void newline_sweep_avx2(const char *, size_t, Cut &&) {}
#endif

bool parse_sam_view(const char *data, size_t n, Record &record,
                    bool keep_line, bool lazy_seq = false) {
    /* the raw line is only needed when records may be forwarded as text
     * (non-extract mode); the extraction path skips the 100-byte copy */
    if (keep_line) record.line.assign(data, n);
    else record.line.clear();
    record.cigar.clear();
    record.has_sa = false;
    record.hi_present = false;
    record.hi_value = 0;
    record.max_soft_clip = 0;

    int field_index = 0;
    int64_t ref_consumed = 0;
    size_t cigar_start = 0, cigar_end = 0;
    record.seq.clear();

    uint32_t tabs[96];
    int n_tabs = cpu_has_avx2() ? collect_tabs_avx2(data, n, tabs, 96) : -1;
    if (n_tabs >= 0) {
        /* fast path: field f spans (tabs[f-1]+1, tabs[f]) */
        if (n_tabs < 10)
            return false;  /* SAM needs 11 tab-separated columns */
        field_index = n_tabs + 1;
        auto field_at = [&](int f, size_t &start, size_t &end) {
            start = f == 0 ? 0 : (size_t)tabs[f - 1] + 1;
            end = f < n_tabs ? (size_t)tabs[f] : n;
        };
        size_t start, end;
        record.qname_len = tabs[0];
        field_at(1, start, end);
        record.flag = (uint16_t)sam_parse_uint(data + start, data + end);
        field_at(2, start, end);
        record.rname_start = (uint32_t)start;
        record.rname_len = (uint32_t)(end - start);
        field_at(3, start, end);
        record.pos = sam_parse_int(data + start, data + end) - 1;
        field_at(5, cigar_start, cigar_end);
        field_at(9, start, end);
        record.seq_start = (uint32_t)start;
        record.seq_len_span = (uint32_t)(end - start);
        if (lazy_seq)
            record.seq.clear();
        else
            record.seq.assign(data + start, end - start);
        for (int f = 11; f <= n_tabs; ++f) {
            field_at(f, start, end);
            if (end - start >= 5 && data[start] == 'S' &&
                data[start + 1] == 'A' && data[start + 2] == ':')
                record.has_sa = true;
            if (end - start >= 6 && data[start] == 'H' &&
                data[start + 1] == 'I' && data[start + 2] == ':' &&
                data[start + 3] == 'i' && data[start + 4] == ':') {
                record.hi_present = true;
                record.hi_value = sam_parse_int(data + start + 5, data + end);
            }
        }
    } else {
        size_t field_start = 0;
        while (field_start <= n) {
            const char *tab_pos = (const char *)memchr(data + field_start, '\t',
                                                       n - field_start);
            bool has_tab = tab_pos != nullptr;
            size_t field_end = has_tab ? (size_t)(tab_pos - data) : n;
            switch (field_index) {
                case 0: record.qname_len = (uint32_t)field_end; break;
                case 1: record.flag = (uint16_t)sam_parse_uint(data + field_start, data + field_end); break;
                case 2:
                    record.rname_start = (uint32_t)field_start;
                    record.rname_len = (uint32_t)(field_end - field_start);
                    break;
                case 3: record.pos = sam_parse_int(data + field_start, data + field_end) - 1; break;
                case 5: cigar_start = field_start; cigar_end = field_end; break;
                case 9:
                    record.seq_start = (uint32_t)field_start;
                    record.seq_len_span = (uint32_t)(field_end - field_start);
                    if (lazy_seq)
                        record.seq.clear();
                    else
                        record.seq.assign(data + field_start,
                                          field_end - field_start);
                    break;
                default:
                    if (field_index >= 11 && field_end - field_start >= 5 &&
                        data[field_start] == 'S' && data[field_start + 1] == 'A' &&
                        data[field_start + 2] == ':')
                        record.has_sa = true;
                    if (field_index >= 11 && field_end - field_start >= 6 &&
                        data[field_start] == 'H' && data[field_start + 1] == 'I' &&
                        data[field_start + 2] == ':' && data[field_start + 3] == 'i' &&
                        data[field_start + 4] == ':') {
                        record.hi_present = true;
                        record.hi_value = sam_parse_int(data + field_start + 5, data + field_end);
                    }
            }
            field_index++;
            if (!has_tab) break;
            field_start = field_end + 1;
        }
    }
    if (field_index < 11)
        return false;

    /* CIGAR (parsed in place from the field slice) */
    if (!(cigar_end - cigar_start == 1 && data[cigar_start] == '*')) {
        uint32_t oplen = 0;
        for (size_t ci = cigar_start; ci < cigar_end; ++ci) {
            char c = data[ci];
            if (c >= '0' && c <= '9') {
                oplen = oplen * 10 + (uint32_t)(c - '0');
                if (oplen > 0xFFFFFFFu)
                    return false;  // would truncate in the packed word
            } else {
                uint8_t coded = CIGAR_OP_LUT.code[(uint8_t)c];
                if (coded == 0) return false;
                uint32_t op = (uint32_t)(coded - 1);
                record.cigar.push_back((oplen << 4) | op);
                if (op == CSOFT_CLIP && (int)oplen > record.max_soft_clip)
                    record.max_soft_clip = (int)oplen;
                if ((CONSUMES_REF >> op) & 1) ref_consumed += oplen;
                oplen = 0;
            }
        }
    }
    record.end_pos = record.pos + ref_consumed;
    record.tid = -2;   /* resolved by the caller via the header name map */
    record.mtid = -2;
    return true;
}

bool parse_sam_line(const std::string &line, Record &record,
                    bool keep_line = true) {
    return parse_sam_view(line.c_str(), line.size(), record, keep_line);
}

/* ---- slim triage parse ---------------------------------------------------
 *
 * ~96 % of aligner output records are boring proper pairs that the scan
 * consumes inline; they never need a full Record (heap-backed cigar/seq,
 * ~200 B of stores). RecordLite carries exactly the fields the boring-pair
 * test and the simple-cigar coverage walk read; only records that fail the
 * lite consume get the full parse_sam_view. Every validation check (field
 * count, CIGAR grammar, oplen bound) is replicated bit-for-bit so lite and
 * full parse accept the same lines. */

struct RecordLite {
    int64_t pos = 0, end_pos = 0;
    long long hi_value = 0;
    int32_t tid = -2;
    uint32_t qname_len = 0;
    uint32_t rname_start = 0, rname_len = 0;
    uint32_t m_oplen = 0;     /* cigar is exactly one query+ref op: its len
                                 (0 when the cigar is not "simple") */
    int32_t max_soft_clip = 0;
    uint16_t flag = 0;
    bool has_sa = false, hi_present = false;
};

bool parse_sam_lite(const char *data, size_t n, RecordLite &lite) {
    lite.has_sa = false;
    lite.hi_present = false;
    lite.hi_value = 0;
    lite.max_soft_clip = 0;
    lite.m_oplen = 0;
    lite.tid = -2;

    uint32_t tabs[96];
    int n_tabs = cpu_has_avx2() ? collect_tabs_avx2(data, n, tabs, 96) : -1;
    size_t cigar_start = 0, cigar_end = 0;
    if (n_tabs >= 0) {
        if (n_tabs < 10)
            return false;
        auto field_at = [&](int f, size_t &start, size_t &end) {
            start = f == 0 ? 0 : (size_t)tabs[f - 1] + 1;
            end = f < n_tabs ? (size_t)tabs[f] : n;
        };
        size_t start, end;
        lite.qname_len = tabs[0];
        field_at(1, start, end);
        lite.flag = (uint16_t)sam_parse_uint(data + start, data + end);
        field_at(2, start, end);
        lite.rname_start = (uint32_t)start;
        lite.rname_len = (uint32_t)(end - start);
        field_at(3, start, end);
        lite.pos = sam_parse_int(data + start, data + end) - 1;
        field_at(5, cigar_start, cigar_end);
        for (int f = 11; f <= n_tabs; ++f) {
            field_at(f, start, end);
            if (end - start >= 5 && data[start] == 'S' &&
                data[start + 1] == 'A' && data[start + 2] == ':')
                lite.has_sa = true;
            if (end - start >= 6 && data[start] == 'H' &&
                data[start + 1] == 'I' && data[start + 2] == ':' &&
                data[start + 3] == 'i' && data[start + 4] == ':') {
                lite.hi_present = true;
                lite.hi_value = sam_parse_int(data + start + 5, data + end);
            }
        }
    } else {
        /* scalar fallback (no AVX2): same field walk as parse_sam_view */
        size_t field_start = 0;
        int field_index = 0;
        while (field_start <= n) {
            const char *tab_pos = (const char *)memchr(
                data + field_start, '\t', n - field_start);
            bool has_tab = tab_pos != nullptr;
            size_t field_end = has_tab ? (size_t)(tab_pos - data) : n;
            switch (field_index) {
                case 0: lite.qname_len = (uint32_t)field_end; break;
                case 1:
                    lite.flag = (uint16_t)sam_parse_uint(data + field_start,
                                                         data + field_end);
                    break;
                case 2:
                    lite.rname_start = (uint32_t)field_start;
                    lite.rname_len = (uint32_t)(field_end - field_start);
                    break;
                case 3:
                    lite.pos = sam_parse_int(data + field_start,
                                             data + field_end) - 1;
                    break;
                case 5:
                    cigar_start = field_start;
                    cigar_end = field_end;
                    break;
                default:
                    if (field_index >= 11
                        && field_end - field_start >= 5
                        && data[field_start] == 'S'
                        && data[field_start + 1] == 'A'
                        && data[field_start + 2] == ':')
                        lite.has_sa = true;
                    if (field_index >= 11
                        && field_end - field_start >= 6
                        && data[field_start] == 'H'
                        && data[field_start + 1] == 'I'
                        && data[field_start + 2] == ':'
                        && data[field_start + 3] == 'i'
                        && data[field_start + 4] == ':') {
                        lite.hi_present = true;
                        lite.hi_value = sam_parse_int(
                            data + field_start + 5, data + field_end);
                    }
            }
            field_index++;
            if (!has_tab) break;
            field_start = field_end + 1;
        }
        if (field_index < 11)
            return false;
    }

    int64_t ref_consumed = 0;
    uint32_t n_ops = 0, first_word = 0;
    bool simple = true;
    if (!(cigar_end - cigar_start == 1 && data[cigar_start] == '*')) {
        uint32_t oplen = 0;
        for (size_t ci = cigar_start; ci < cigar_end; ++ci) {
            char c = data[ci];
            if (c >= '0' && c <= '9') {
                oplen = oplen * 10 + (uint32_t)(c - '0');
                if (oplen > 0xFFFFFFFu)
                    return false;
            } else {
                uint8_t coded = CIGAR_OP_LUT.code[(uint8_t)c];
                if (coded == 0) return false;
                uint32_t op = (uint32_t)(coded - 1);
                if (n_ops == 0) first_word = (oplen << 4) | op;
                else simple = false;
                n_ops += 1;
                if (op == CSOFT_CLIP &&
                    (int32_t)oplen > lite.max_soft_clip)
                    lite.max_soft_clip = (int32_t)oplen;
                if ((CONSUMES_REF >> op) & 1) ref_consumed += oplen;
                oplen = 0;
            }
        }
    }
    if (simple && n_ops == 1) {
        uint32_t op = first_word & 0xf;
        if (((CONSUMES_REF >> op) & (CONSUMES_QUERY >> op)) & 1)
            lite.m_oplen = first_word >> 4;
    }
    lite.end_pos = lite.pos + ref_consumed;
    return true;
}

/* the boring-pair test off lite fields — same predicate/argument order as
 * pair_is_boring(record = later arrival r2, mate = r1) */
bool pair_is_boring_lite(const Scanner &sc, const RecordLite &r2,
                         const RecordLite &r1) {
    if (r2.has_sa || r1.has_sa)
        return false;
    if (r2.max_soft_clip >= MIN_CLIPPED_FORWARD ||
        r1.max_soft_clip >= MIN_CLIPPED_FORWARD)
        return false;
    if (r2.tid != r1.tid)
        return false;
    int64_t lo = std::min(r2.pos, r1.pos);
    int64_t hi = std::max(r2.end_pos, r1.end_pos);
    return !spans_gene_boundary(sc, r2.tid, lo, hi);
}

/* add_fragment's simple proper-pair fast path off scalars (mate1 = r2, the
 * later arrival, exactly like the full path's argument order) */
void add_fragment_simple_pair(Scanner &scanner, int tid, uint16_t flag1,
                              int64_t pos1, int64_t end1, int64_t pos2,
                              int64_t end2) {
    if (tid < 0 || tid >= (int)scanner.planes.size())
        return;
    CoveragePlane &plane = scanner.planes[tid];
    if (plane.windows == 0)
        return;

    if (!(flag1 & FREVERSE) || !(flag1 & FPAIRED)) {
        int64_t w = pos1 / COVERAGE_RESOLUTION;
        if (w >= 0 && w < plane.windows)
            cov_flag(scanner, 1, tid, plane, w);
    } else {
        int64_t w = pos2 / COVERAGE_RESOLUTION;
        if (w >= 0 && w < plane.windows)
            cov_flag(scanner, 1, tid, plane, w);
    }

    const int64_t near_end = std::min(end1, end2);
    const int64_t far_end = std::max(end1, end2);
    const int64_t far_start = end1 < end2 ? pos2 : pos1;
    const int64_t half = COVERAGE_RESOLUTION / 2;
    int64_t window = std::min(pos1, pos2) / COVERAGE_RESOLUTION;
    int64_t w = std::max(window, (int64_t)0);
    int64_t top = std::min(near_end >= half
                               ? (near_end - half) / COVERAGE_RESOLUTION
                               : (int64_t)-1,
                           (int64_t)plane.windows - 1);
    cov_inc_range(scanner, tid, plane, w, top);
    w = std::max(near_end / COVERAGE_RESOLUTION + 1,
                 std::max(far_start / COVERAGE_RESOLUTION, (int64_t)0));
    top = std::min(far_end >= half
                       ? (far_end - half) / COVERAGE_RESOLUTION
                       : (int64_t)-1,
                   (int64_t)plane.windows - 1);
    cov_inc_range(scanner, tid, plane, w, top);
    if ((flag1 & FREVERSE) || !(flag1 & FPAIRED)) {
        int64_t we = (end1 - 1) / COVERAGE_RESOLUTION;
        if (we >= 0 && we < plane.windows)
            cov_flag(scanner, 2, tid, plane, we);
    } else {
        int64_t we = (end2 - 1) / COVERAGE_RESOLUTION;
        if (we >= 0 && we < plane.windows)
            cov_flag(scanner, 2, tid, plane, we);
    }
}

/* the whole lite consume: validity + boring test + counters + coverage.
 * Restricted to simple-cigar non-viral pairs; anything else reports false
 * and the caller full-parses + runs the exact consume. */
bool consume_adjacent_boring_pair_lite(Scanner &sc, Extractor &ex,
                                       const RecordLite &r1,
                                       const RecordLite &r2,
                                       std::string_view qname1,
                                       std::string_view qname2) {
    const uint16_t bad = FUNMAP | FMUNMAP | FSECONDARY | FSUPPLEMENTARY;
    const uint16_t need = FPAIRED | FPROPER_PAIR;
    if ((r1.flag & bad) || (r2.flag & bad))
        return false;
    if (r1.tid < 0 || r2.tid < 0)
        return false;
    if ((r1.flag & need) != need || (r2.flag & need) != need)
        return false;
    if (r1.m_oplen == 0 || r2.m_oplen == 0)
        return false;  /* non-simple cigar: exact path decides */
    if (r2.tid < (int32_t)sc.viral.size() && sc.viral[r2.tid])
        return false;  /* viral pristine counting needs sequences */
    if (qname1 != qname2)
        return false;
    long long hit1 = r1.hi_present ? r1.hi_value : 1;
    long long hit2 = r2.hi_present ? r2.hi_value : 1;
    if (hit1 != hit2)
        return false;
    if (!pair_is_boring_lite(sc, r2, r1))
        return false;
    sc.n_records += 2;
    for (const RecordLite *r : {&r1, &r2})
        if (r->tid >= 0 && r->tid < (int32_t)sc.interesting.size() &&
            sc.interesting[r->tid])
            ex.mapped_reads += 1;
    if (!sc.external_duplicate_marking || !(r2.flag & FDUP))
        add_fragment_simple_pair(sc, r2.tid, r2.flag, r2.pos,
                                 r2.pos + r2.m_oplen, r1.pos,
                                 r1.pos + r1.m_oplen);
    return true;
}

/* ---- gzip line reader --------------------------------------------------- */

/* zlib signalled a real error (corrupt/truncated stream) rather than a
 * clean end of file */
static bool gz_stream_corrupt(gzFile gz, int last_read) {
    if (last_read < 0)
        return true;
    int err = Z_OK;
    gzerror(gz, &err);
    return err != Z_OK && err != Z_STREAM_END;
}

class GzLineReader {
    gzFile gz_;
    std::vector<char> buffer_;
    size_t begin_ = 0, end_ = 0;
    bool eof_ = false;
    bool corrupt_ = false;

public:
    explicit GzLineReader(gzFile gz) : gz_(gz), buffer_(1 << 20) {}

    /* preload: already-consumed bytes (scan_open header sniffing) that must
     * be served before the next gzread */
    GzLineReader(gzFile gz, const std::string &preload)
        : gz_(gz), buffer_(std::max((size_t)(1 << 20), preload.size())) {
        memcpy(buffer_.data(), preload.data(), preload.size());
        end_ = preload.size();
    }

    bool corrupt() const { return corrupt_; }

    bool next_line(std::string &line) {
        line.clear();
        for (;;) {
            for (size_t i = begin_; i < end_; ++i) {
                if (buffer_[i] == '\n') {
                    line.append(&buffer_[begin_], i - begin_);
                    begin_ = i + 1;
                    if (!line.empty() && line.back() == '\r') line.pop_back();
                    return true;
                }
            }
            line.append(&buffer_[begin_], end_ - begin_);
            begin_ = end_ = 0;
            if (eof_) return !line.empty();
            int got = gzread(gz_, buffer_.data(), (unsigned)buffer_.size());
            if (got <= 0) {
                eof_ = true;
                corrupt_ = corrupt_ || gz_stream_corrupt(gz_, got);
                if (line.empty()) return false;
                continue;
            }
            end_ = (size_t)got;
        }
    }
};

/* block reader for the sharded SAM scan: whole-line chunks with zero
 * per-line copies (workers parse string_view slices of the chunk) */
class GzChunkReader {
    gzFile gz_;
    bool eof_ = false;
    bool corrupt_ = false;
    std::string carry_;  /* partial trailing line of the previous chunk */

public:
    explicit GzChunkReader(gzFile gz) : gz_(gz) {}
    GzChunkReader(gzFile gz, const std::string &preload) : gz_(gz) {
        carry_ = preload;
    }
    bool corrupt() const { return corrupt_; }
    bool exhausted() const { return eof_ && carry_.empty(); }

    /* fill `data` with complete lines totalling ~target bytes; returns
     * false when the stream is fully consumed */
    bool next_chunk(std::string &data, size_t target) {
        data.assign(carry_);
        carry_.clear();
        for (;;) {
            while (data.size() < target && !eof_) {
                size_t old = data.size();
                data.resize(old + (1 << 20));
                int got = gzread(gz_, &data[old], 1 << 20);
                if (got <= 0) {
                    data.resize(old);
                    eof_ = true;
                    corrupt_ = corrupt_ || gz_stream_corrupt(gz_, got);
                    break;
                }
                data.resize(old + (size_t)got);
            }
            if (eof_)
                return !data.empty();
            size_t cut = data.rfind('\n');
            if (cut == std::string::npos) {
                /* a single line longer than the target: keep growing */
                target *= 2;
                continue;
            }
            carry_.assign(data, cut + 1, std::string::npos);
            data.resize(cut + 1);
            return true;
        }
    }
};

/* read-only whole-file mapping for plain (uncompressed, regular-file) SAM
 * input: chunks become views into the mapping, removing the main-thread
 * gzread memcpy from the scan's critical path (page faults distribute onto
 * the parse workers touching the pages) */
class MappedFile {
    const char *data_ = nullptr;
    size_t size_ = 0;

public:
    bool open_file(const char *path) {
        int fd = ::open(path, O_RDONLY);
        if (fd < 0)
            return false;
        struct stat st;
        if (fstat(fd, &st) != 0 || !S_ISREG(st.st_mode) || st.st_size == 0) {
            ::close(fd);
            return false;
        }
        void *map = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE,
                         fd, 0);
        ::close(fd);
        if (map == MAP_FAILED)
            return false;
        madvise(map, (size_t)st.st_size, MADV_SEQUENTIAL);
        madvise(map, (size_t)st.st_size, MADV_WILLNEED);
#ifdef MADV_HUGEPAGE
        /* THP halves the TLB pressure of the 2 GB+ sweep/parse passes */
        madvise(map, (size_t)st.st_size, MADV_HUGEPAGE);
#endif
        data_ = (const char *)map;
        size_ = (size_t)st.st_size;
        return true;
    }
    ~MappedFile() {
        if (data_ != nullptr)
            munmap((void *)data_, size_);
    }
    bool ok() const { return data_ != nullptr; }
    const char *data() const { return data_; }
    size_t size() const { return size_; }
};

/* ---- BAM binary parsing (BGZF decompressed by zlib's gzread) ------------ */

class GzBlockReader {
    gzFile gz_;
    bool corrupt_ = false;
public:
    explicit GzBlockReader(gzFile gz) : gz_(gz) {}
    bool corrupt() const { return corrupt_; }
    bool read_exact(void *data, size_t n) {
        size_t got = 0;
        while (got < n) {
            int r = gzread(gz_, (char *)data + got, (unsigned)(n - got));
            if (r <= 0) {
                /* mid-record EOF is truncation even when zlib is happy */
                corrupt_ = corrupt_ || got > 0 || gz_stream_corrupt(gz_, r);
                return false;
            }
            got += (size_t)r;
        }
        return true;
    }
};

void append_int(std::string &out, long long value) {
    char buffer[24];
    snprintf(buffer, sizeof buffer, "%lld", value);
    out += buffer;
}

/* decode one BAM record body (after block_size): parse only the fields the
 * classifier needs; the SAM line is built lazily for forwarded records */
bool decode_bam_record(const std::vector<uint8_t> &body, Record &record) {
    if (body.size() < 32) return false;
    auto rd32 = [&](size_t offset) {
        int32_t v; memcpy(&v, body.data() + offset, 4); return v; };
    int32_t tid = rd32(0);
    int32_t pos = rd32(4);
    uint32_t l_read_name = body[8];
    uint32_t n_cigar = (uint32_t)rd32(12) & 0xffff;
    uint16_t flag = (uint16_t)(((uint32_t)rd32(12)) >> 16);
    int32_t l_seq = rd32(16);
    int32_t mtid = rd32(20);
    size_t offset = 32;
    if (l_seq < 0 || l_read_name < 1)
        return false;
    if (body.size() < offset + l_read_name + 4ull * n_cigar
                          + (uint32_t)(l_seq + 1) / 2 + (uint32_t)l_seq)
        return false;
    /* qname must be NUL-terminated inside its region (the forwarding path
     * reads it as a C string) */
    if (body[offset + l_read_name - 1] != 0)
        return false;
    offset += l_read_name;
    const uint32_t *cigar = (const uint32_t *)(body.data() + offset);
    offset += 4ull * n_cigar;
    const uint8_t *seq4 = body.data() + offset;
    offset += (l_seq + 1) / 2;
    offset += l_seq;  /* qual */

    record.flag = flag;
    record.tid = tid;
    record.pos = pos;
    record.mtid = mtid;
    record.cigar.assign(cigar, cigar + n_cigar);
    record.has_sa = false;
    record.hi_present = false;
    record.hi_value = 0;
    record.max_soft_clip = 0;
    record.line.clear();
    int64_t ref_consumed = 0;
    for (uint32_t word : record.cigar) {
        uint32_t op = word & 0xf;
        if (op == CSOFT_CLIP && (int)(word >> 4) > record.max_soft_clip)
            record.max_soft_clip = (int)(word >> 4);
        if ((CONSUMES_REF >> op) & 1) ref_consumed += word >> 4;
    }
    record.end_pos = record.pos + ref_consumed;

    /* seq decode (needed for the pristine-viral test of boring pairs) */
    record.seq.resize(l_seq);
    for (int32_t i = 0; i < l_seq; ++i)
        record.seq[i] = NT16[(seq4[i >> 1] >> ((~i & 1) << 2)) & 0xf];

    /* SA-tag presence scan (cheap, no text construction) */
    {
        size_t aux = offset;
        const size_t end = body.size();
        while (aux + 3 <= end) {
            char tag0 = (char)body[aux], tag1 = (char)body[aux + 1];
            char type = (char)body[aux + 2];
            aux += 3;
            if (tag0 == 'S' && tag1 == 'A' && type == 'Z')
                record.has_sa = true;
            bool is_hi = (tag0 == 'H' && tag1 == 'I');
            /* every payload is bounds-checked; a malformed aux region
             * rejects the whole record (the SAM serializer reads these
             * payloads unchecked later) */
            switch (type) {
                case 'c':
                    if (aux + 1 > end) return false;
                    if (is_hi) { record.hi_present = true; record.hi_value = *(const int8_t *)(body.data() + aux); }
                    aux += 1; break;
                case 'C':
                    if (aux + 1 > end) return false;
                    if (is_hi) { record.hi_present = true; record.hi_value = body[aux]; }
                    aux += 1; break;
                case 'A':
                    if (aux + 1 > end) return false;
                    aux += 1; break;
                case 's':
                    if (aux + 2 > end) return false;
                    if (is_hi) { int16_t v; memcpy(&v, body.data() + aux, 2); record.hi_present = true; record.hi_value = v; }
                    aux += 2; break;
                case 'S':
                    if (aux + 2 > end) return false;
                    if (is_hi) { uint16_t v; memcpy(&v, body.data() + aux, 2); record.hi_present = true; record.hi_value = v; }
                    aux += 2; break;
                case 'i':
                    if (aux + 4 > end) return false;
                    if (is_hi) { int32_t v; memcpy(&v, body.data() + aux, 4); record.hi_present = true; record.hi_value = v; }
                    aux += 4; break;
                case 'I':
                    if (aux + 4 > end) return false;
                    if (is_hi) { uint32_t v; memcpy(&v, body.data() + aux, 4); record.hi_present = true; record.hi_value = v; }
                    aux += 4; break;
                case 'f':
                    if (aux + 4 > end) return false;
                    aux += 4; break;
                case 'd':
                    if (aux + 8 > end) return false;
                    aux += 8; break;
                case 'Z': case 'H': {
                    size_t terminator = aux;
                    while (terminator < end && body[terminator]) ++terminator;
                    if (terminator >= end) return false;  /* no NUL */
                    aux = terminator + 1;
                    break;
                }
                case 'B': {
                    if (aux + 5 > end) return false;
                    char sub = (char)body[aux]; aux += 1;
                    int32_t count; memcpy(&count, body.data() + aux, 4); aux += 4;
                    if (count < 0) return false;
                    size_t item;
                    if (sub=='c'||sub=='C') item = 1;
                    else if (sub=='s'||sub=='S') item = 2;
                    else if (sub=='i'||sub=='I'||sub=='f') item = 4;
                    else return false;
                    if ((size_t)count > (end - aux) / item) return false;
                    aux += item * (size_t)count;
                    break;
                }
                default: return false;  /* unknown aux type: reject the
                    record like every other malformed-payload case, so an
                    SA tag after the corruption cannot be silently missed */
            }
        }
    }
    return true;
}

/* serialize a decoded BAM record to one SAM line (forwarded records only) */
void bam_record_to_sam(const Record &record,
                       const std::vector<std::string> &target_names,
                       std::string &line) {
    const std::vector<uint8_t> &body = record.bam_body;
    auto rd32 = [&](size_t offset) {
        int32_t v; memcpy(&v, body.data() + offset, 4); return v; };
    int32_t tid = rd32(0);
    int32_t pos = rd32(4);
    uint32_t l_read_name = body[8];
    uint8_t mapq = body[9];
    uint32_t n_cigar = (uint32_t)rd32(12) & 0xffff;
    uint16_t flag = (uint16_t)(((uint32_t)rd32(12)) >> 16);
    int32_t l_seq = rd32(16);
    int32_t mtid = rd32(20);
    int32_t mpos = rd32(24);
    int32_t tlen = rd32(28);
    size_t offset = 32;
    const char *qname = (const char *)body.data() + offset;
    offset += l_read_name;
    offset += 4ull * n_cigar;
    offset += (l_seq + 1) / 2;
    const uint8_t *qual = body.data() + offset;
    offset += l_seq;

    line.clear();
    line.append(qname);
    line += '\t'; append_int(line, flag);
    line += '\t';
    line += (tid >= 0 && tid < (int)target_names.size()) ? target_names[tid] : "*";
    line += '\t'; append_int(line, (long long)pos + 1);
    line += '\t'; append_int(line, mapq);
    line += '\t';
    if (n_cigar == 0) {
        line += '*';
    } else {
        for (uint32_t word : record.cigar) {
            append_int(line, word >> 4);
            line += CIGAR_CHARS[word & 0xf];
        }
    }
    (void)record;
    line += '\t';
    line += (mtid >= 0 && mtid < (int)target_names.size()) ? target_names[mtid] : "*";
    line += '\t'; append_int(line, (long long)mpos + 1);
    line += '\t'; append_int(line, tlen);
    line += '\t';
    line += l_seq ? record.seq : std::string("*");
    line += '\t';
    if (l_seq == 0 || qual[0] == 0xff) {
        line += '*';
    } else {
        for (int32_t i = 0; i < l_seq; ++i) line += (char)(qual[i] + 33);
    }

    /* aux fields (decode_bam_record validated every payload against
     * body.size(); the checks here are defense in depth and truncate the
     * aux text rather than read out of bounds) */
    size_t end = body.size();
    while (offset + 3 <= end) {
        char tag0 = (char)body[offset], tag1 = (char)body[offset + 1];
        char type = (char)body[offset + 2];
        offset += 3;
        size_t need = (type=='A'||type=='c'||type=='C') ? 1
                      : (type=='s'||type=='S') ? 2
                      : (type=='i'||type=='I'||type=='f') ? 4
                      : (type=='B') ? 5 : 0;
        if (offset + need > end) return;
        line += '\t'; line += tag0; line += tag1; line += ':';
        switch (type) {
            case 'A':
                line += "A:"; line += (char)body[offset]; offset += 1; break;
            case 'c': line += "i:"; append_int(line, *(const int8_t *)(body.data() + offset)); offset += 1; break;
            case 'C': line += "i:"; append_int(line, *(const uint8_t *)(body.data() + offset)); offset += 1; break;
            case 's': { int16_t v; memcpy(&v, body.data() + offset, 2); line += "i:"; append_int(line, v); offset += 2; break; }
            case 'S': { uint16_t v; memcpy(&v, body.data() + offset, 2); line += "i:"; append_int(line, v); offset += 2; break; }
            case 'i': { int32_t v; memcpy(&v, body.data() + offset, 4); line += "i:"; append_int(line, v); offset += 4; break; }
            case 'I': { uint32_t v; memcpy(&v, body.data() + offset, 4); line += "i:"; append_int(line, v); offset += 4; break; }
            case 'f': { float v; memcpy(&v, body.data() + offset, 4); char buffer[32]; snprintf(buffer, sizeof buffer, "f:%g", v); line += buffer; offset += 4; break; }
            case 'Z': case 'H': {
                line += type; line += ':';
                while (offset < end && body[offset]) { line += (char)body[offset]; offset += 1; }
                offset += 1;
                break;
            }
            case 'B': {
                char sub = (char)body[offset]; offset += 1;
                int32_t count; memcpy(&count, body.data() + offset, 4); offset += 4;
                line += "B:"; line += sub;
                size_t item = (sub=='c'||sub=='C') ? 1 : (sub=='s'||sub=='S') ? 2 : 4;
                if (count < 0 || (size_t)count > (end - offset) / item) return;
                for (int32_t i = 0; i < count; ++i) {
                    line += ',';
                    long long v = 0;
                    if (sub=='c') v = *(const int8_t*)(body.data()+offset);
                    else if (sub=='C') v = *(const uint8_t*)(body.data()+offset);
                    else if (sub=='s') { int16_t x; memcpy(&x, body.data()+offset, 2); v = x; }
                    else if (sub=='S') { uint16_t x; memcpy(&x, body.data()+offset, 2); v = x; }
                    else if (sub=='i') { int32_t x; memcpy(&x, body.data()+offset, 4); v = x; }
                    else if (sub=='I') { uint32_t x; memcpy(&x, body.data()+offset, 4); v = x; }
                    else { float x; memcpy(&x, body.data()+offset, 4); char buffer[32]; snprintf(buffer, sizeof buffer, "%g", x); line += buffer; offset += item; continue; }
                    append_int(line, v);
                    offset += item;
                }
                break;
            }
            default:
                return;  /* unknown type: stop aux parsing, line is usable */
        }
    }
}

}  // namespace

/* ---- persistent coverage engine (Python Coverage delegates here) -------- */

namespace {
struct CoverageEngine {
    Scanner scanner;                 /* only .planes is used */
    std::vector<Py_buffer> buffers;
    std::vector<PyObject *> owners;
    bool bound = false;
};
CoverageEngine &coverage_engine() {
    static CoverageEngine instance;
    return instance;
}
}  // namespace

static PyObject *coverage_bind(PyObject *, PyObject *args) {
    PyObject *planes_obj;  /* list of (cov_u16, starts_u8, ends_u8) or None, per contig */
    if (!PyArg_ParseTuple(args, "O", &planes_obj))
        return nullptr;
    CoverageEngine &engine = coverage_engine();
    for (Py_buffer &view : engine.buffers)
        PyBuffer_Release(&view);
    for (PyObject *owner : engine.owners)
        Py_DECREF(owner);
    engine.buffers.clear();
    engine.owners.clear();
    engine.scanner.planes.clear();
    Py_ssize_t n = PyList_Size(planes_obj);
    engine.scanner.planes.resize(n);
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject *plane_obj = PyList_GetItem(planes_obj, i);
        if (plane_obj == Py_None)
            continue;
        CoveragePlane plane;
        PyObject *parts[3] = {PyTuple_GetItem(plane_obj, 0),
                              PyTuple_GetItem(plane_obj, 1),
                              PyTuple_GetItem(plane_obj, 2)};
        void *pointers[3];
        for (int k = 0; k < 3; ++k) {
            Py_buffer view;
            if (PyObject_GetBuffer(parts[k], &view, PyBUF_WRITABLE) != 0)
                return nullptr;
            engine.buffers.push_back(view);
            Py_INCREF(parts[k]);
            engine.owners.push_back(parts[k]);
            pointers[k] = view.buf;
            if (k == 0)
                plane.windows = view.len / 2;
        }
        plane.coverage = (uint16_t *)pointers[0];
        plane.starts = (uint8_t *)pointers[1];
        plane.ends = (uint8_t *)pointers[2];
        engine.scanner.planes[i] = plane;
    }
    engine.bound = true;
    Py_RETURN_NONE;
}

static PyObject *coverage_add(PyObject *, PyObject *args) {
    int tid1, flag1, tid2, flag2, is_chimeric, has_mate2;
    long long pos1, pos2;
    Py_buffer cigar1, cigar2;
    if (!PyArg_ParseTuple(args, "iLiy*iiLiy*i", &tid1, &pos1, &flag1, &cigar1,
                          &has_mate2, &tid2, &pos2, &flag2, &cigar2,
                          &is_chimeric))
        return nullptr;
    CoverageEngine &engine = coverage_engine();
    if (!engine.bound) {
        PyBuffer_Release(&cigar1);
        PyBuffer_Release(&cigar2);
        PyErr_SetString(PyExc_RuntimeError, "coverage engine not bound");
        return nullptr;
    }
    Record mate1, mate2;
    mate1.tid = tid1; mate1.pos = pos1; mate1.flag = (uint16_t)flag1;
    mate1.cigar.assign((const uint32_t *)cigar1.buf,
                       (const uint32_t *)cigar1.buf + cigar1.len / 4);
    if (has_mate2) {
        mate2.tid = tid2; mate2.pos = pos2; mate2.flag = (uint16_t)flag2;
        mate2.cigar.assign((const uint32_t *)cigar2.buf,
                           (const uint32_t *)cigar2.buf + cigar2.len / 4);
    }
    add_fragment(engine.scanner, mate1, has_mate2 ? &mate2 : nullptr,
                 is_chimeric != 0, 0, false);
    PyBuffer_Release(&cigar1);
    PyBuffer_Release(&cigar2);
    Py_RETURN_NONE;
}

/* ---- the scan entry point ----------------------------------------------- */

static bool fill_plane(PyObject *obj, Py_buffer *view, void **data,
                       Py_ssize_t *len, int flags) {
    if (PyObject_GetBuffer(obj, view, flags) != 0)
        return false;
    *data = view->buf;
    *len = view->len / (view->itemsize ? view->itemsize : 1);
    return true;
}

namespace {

/* state carried from scan_open() to a resumed scan_sam(): the header has
 * been consumed from the (possibly non-seekable) stream, so the scan must
 * continue from here instead of reopening the path — this is what makes
 * the recommended `STAR ... | arriba_tpu -x /dev/stdin` pipe workflow run
 * through the native scanner (read_chimeric_alignments.cpp lets htslib
 * stream the same way) */
struct OpenScanState {
    gzFile gz = nullptr;
    bool active = false;
    bool is_bam = false;
    bool is_regular_file = false;
    std::string sam_carry;    /* bytes read past the SAM header */
    std::string header_text;
    std::vector<std::string> bam_targets;
    std::string path;

    void reset() {
        if (gz != nullptr) gzclose(gz);
        gz = nullptr;
        active = false;
        is_bam = false;
        is_regular_file = false;
        sam_carry.clear();
        header_text.clear();
        bam_targets.clear();
        path.clear();
    }
};

OpenScanState &open_scan() {
    static OpenScanState state;
    return state;
}

}  // namespace

/* Open an alignment stream and consume only its header. Returns
 * (kind, header_text, target_names, target_lengths) with kind 0=SAM,
 * 1=BAM, 2=CRAM (stream closed; caller must use the seekable path). The
 * stream stays open positioned at the first record; the next
 * scan_sam(..., resume=1) continues from it. */
static PyObject *scan_open(PyObject *, PyObject *args) {
    const char *path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
    OpenScanState &state = open_scan();
    state.reset();

    gzFile gz = gzopen(path, "rb");
    if (gz == nullptr) {
        PyErr_Format(PyExc_IOError, "failed to open alignment file '%s'",
                     path);
        return nullptr;
    }
    gzbuffer(gz, 1 << 20);
    struct stat st;
    state.is_regular_file = stat(path, &st) == 0 && S_ISREG(st.st_mode);
    state.path = path;
    state.gz = gz;

    char magic[4] = {0, 0, 0, 0};
    int magic_got = gzread(gz, magic, 4);
    std::vector<int64_t> lengths;
    int kind;
    if (magic_got == 4 && memcmp(magic, "CRAM", 4) == 0) {
        kind = 2;
        state.reset();
    } else if (magic_got == 4 && memcmp(magic, "BAM\1", 4) == 0) {
        kind = 1;
        state.is_bam = true;
        GzBlockReader serial(gz);
        int32_t l_text = 0, n_ref = 0;
        bool ok = serial.read_exact(&l_text, 4) && l_text >= 0;
        if (ok && l_text > 0) {
            std::vector<char> text(l_text);
            ok = serial.read_exact(text.data(), l_text);
            if (ok)
                state.header_text.assign(text.data(),
                                         strnlen(text.data(), l_text));
        }
        ok = ok && serial.read_exact(&n_ref, 4) && n_ref >= 0;
        for (int32_t i = 0; ok && i < n_ref; ++i) {
            int32_t l_name = 0, l_ref = 0;
            ok = serial.read_exact(&l_name, 4) && l_name > 0;
            if (!ok) break;
            std::vector<char> name(l_name);
            ok = serial.read_exact(name.data(), l_name)
                 && serial.read_exact(&l_ref, 4);
            if (ok) {
                state.bam_targets.emplace_back(
                    name.data(), strnlen(name.data(), l_name));
                lengths.push_back(l_ref);
            }
        }
        if (!ok) {
            state.reset();
            PyErr_Format(PyExc_IOError,
                         "truncated or corrupt BAM header in '%s'", path);
            return nullptr;
        }
        state.active = true;
    } else {
        kind = 0;
        /* SAM text: collect '@' header lines; the first record line (and
         * everything buffered after it) becomes the carry for the scan */
        std::string buffered(magic, (size_t)std::max(magic_got, 0));
        size_t line_start = 0;
        bool done = false;
        while (!done) {
            size_t pos = line_start;
            while (pos < buffered.size()) {
                size_t nl = buffered.find('\n', pos);
                if (nl == std::string::npos) break;
                size_t len = nl - pos;
                if (len > 0 && buffered[pos] != '@') {
                    state.sam_carry = buffered.substr(pos);
                    done = true;
                    break;
                }
                if (len > 0) {
                    size_t text_len =
                        buffered[nl - 1] == '\r' ? len - 1 : len;
                    state.header_text.append(buffered, pos, text_len);
                    state.header_text += '\n';
                }
                pos = nl + 1;
            }
            if (done) break;
            /* drop fully-consumed header bytes, keep the partial line */
            buffered.erase(0, pos);
            line_start = 0;
            size_t old = buffered.size();
            buffered.resize(old + (1 << 20));
            int got = gzread(gz, &buffered[old], 1 << 20);
            if (got <= 0) {
                buffered.resize(old);
                if (gz_stream_corrupt(gz, got)) {
                    state.reset();
                    PyErr_Format(PyExc_IOError,
                                 "corrupt gzip stream in SAM input '%s'",
                                 path);
                    return nullptr;
                }
                /* EOF: a trailing newline-less record line still counts */
                if (!buffered.empty() && buffered[0] != '@') {
                    state.sam_carry = buffered;
                } else if (!buffered.empty()) {
                    state.header_text.append(buffered);
                    state.header_text += '\n';
                }
                break;
            }
            buffered.resize(old + (size_t)got);
        }
        /* parse @SQ lines for target names/lengths */
        size_t pos = 0;
        while (pos < state.header_text.size()) {
            size_t nl = state.header_text.find('\n', pos);
            size_t end = nl == std::string::npos ? state.header_text.size()
                                                 : nl;
            if (state.header_text.compare(pos, 3, "@SQ") == 0) {
                std::string name;
                int64_t length = 0;
                size_t field = pos;
                while (field < end) {
                    size_t tab = state.header_text.find('\t', field);
                    if (tab == std::string::npos || tab > end) tab = end;
                    if (state.header_text.compare(field, 3, "SN:") == 0)
                        name = state.header_text.substr(field + 3,
                                                        tab - field - 3);
                    else if (state.header_text.compare(field, 3, "LN:") == 0)
                        length = atoll(state.header_text.c_str() + field + 3);
                    field = tab + 1;
                }
                if (!name.empty()) {
                    state.bam_targets.push_back(name);
                    lengths.push_back(length);
                }
            }
            if (nl == std::string::npos) break;
            pos = nl + 1;
        }
        state.active = true;
    }

    PyObject *names_list = PyList_New((Py_ssize_t)state.bam_targets.size());
    PyObject *lengths_list = PyList_New((Py_ssize_t)lengths.size());
    for (size_t i = 0; i < state.bam_targets.size(); ++i)
        PyList_SetItem(names_list, (Py_ssize_t)i,
                       PyUnicode_FromStringAndSize(
                           state.bam_targets[i].data(),
                           (Py_ssize_t)state.bam_targets[i].size()));
    for (size_t i = 0; i < lengths.size(); ++i)
        PyList_SetItem(lengths_list, (Py_ssize_t)i,
                       PyLong_FromLongLong(lengths[i]));
    return Py_BuildValue("(is#NN)", kind, state.header_text.data(),
                         (Py_ssize_t)state.header_text.size(), names_list,
                         lengths_list);
}

static PyObject *scan_sam(PyObject *, PyObject *args) {
    const char *path;
    PyObject *name_to_tid_obj;      /* dict: contig name (str) -> tid (int) */
    PyObject *boundaries_obj;       /* list of bytes (int64 little-endian) per tid */
    PyObject *interesting_obj;      /* bytes per tid */
    PyObject *viral_obj;            /* bytes per tid */
    PyObject *coverage_obj;         /* list of (cov_u16, starts_u8, ends_u8) or None */
    int external_duplicate_marking;
    int threads = 1;
    PyObject *extract_obj = Py_None; /* None, or (gene_offsets, gene_items,
                                        gene_start, gene_end, assembly_list,
                                        tid_to_contig, max_itd_length) enabling
                                        full-native extraction */
    int resume = 0;                  /* continue the stream scan_open() left
                                        positioned at the first record */
    PyObject *shard_obj = Py_None;   /* sharded-sample ingest: ("worker",
                                        start_byte, end_byte) or ("merge",
                                        [fragment_blobs], [leftover_blobs]) */

    if (!PyArg_ParseTuple(args, "sOOOOOpi|OiO", &path, &name_to_tid_obj,
                          &boundaries_obj, &interesting_obj, &viral_obj,
                          &coverage_obj, &external_duplicate_marking, &threads,
                          &extract_obj, &resume, &shard_obj))
        return nullptr;

    int shard_mode = 0;  /* 0 none, 1 worker, 2 merge */
    /* worker spec: (worker_idx=shard_start, n_procs=shard_end) over
     * interleaved stripes of shard_stripe bytes — striping keeps the load
     * balanced whatever the record layout (a contiguous byte split is
     * pathological when chimeric records cluster) */
    int64_t shard_start = 0, shard_end = 0, shard_stripe = 16 << 20;
    PyObject *merge_frag_blobs = nullptr, *merge_leftover_blobs = nullptr;
    if (shard_obj != Py_None) {
        const char *kind = PyUnicode_AsUTF8(PyTuple_GetItem(shard_obj, 0));
        if (kind == nullptr) return nullptr;
        if (strcmp(kind, "worker") == 0) {
            shard_mode = 1;
            shard_start = PyLong_AsLongLong(PyTuple_GetItem(shard_obj, 1));
            shard_end = PyLong_AsLongLong(PyTuple_GetItem(shard_obj, 2));
            if (PyTuple_Size(shard_obj) >= 4)
                shard_stripe =
                    PyLong_AsLongLong(PyTuple_GetItem(shard_obj, 3));
        } else if (strcmp(kind, "merge") == 0) {
            shard_mode = 2;
            merge_frag_blobs = PyTuple_GetItem(shard_obj, 1);
            merge_leftover_blobs = PyTuple_GetItem(shard_obj, 2);
        } else {
            PyErr_SetString(PyExc_ValueError, "bad shard_spec kind");
            return nullptr;
        }
        if (PyErr_Occurred()) return nullptr;
    }

    gzFile gz;
    std::string resume_carry;               /* SAM bytes past the header */
    std::vector<std::string> resume_targets;
    std::string resume_header;
    bool resume_is_bam = false;
    bool resume_regular = false;
    if (resume) {
        OpenScanState &state = open_scan();
        if (!state.active || state.path != path) {
            PyErr_SetString(PyExc_RuntimeError,
                            "scan_sam(resume=1) without a matching "
                            "scan_open()");
            return nullptr;
        }
        /* take ownership of the open stream and header state */
        gz = state.gz;
        state.gz = nullptr;
        resume_carry = std::move(state.sam_carry);
        resume_targets = std::move(state.bam_targets);
        resume_header = std::move(state.header_text);
        resume_is_bam = state.is_bam;
        resume_regular = state.is_regular_file;
        state.reset();
    } else {
        gz = gzopen(path, "rb");
        if (gz == nullptr) {
            PyErr_SetString(PyExc_IOError, "failed to open alignment file");
            return nullptr;
        }
        gzbuffer(gz, 1 << 20);
    }

    Scanner scanner;
    scanner.external_duplicate_marking = external_duplicate_marking != 0;
    std::string stream_error;  /* corruption detected while reading the input;
                                  raised as IOError instead of silently
                                  truncating the scan (htslib parity) */

    /* per-tid tables */
    Py_ssize_t n_tids = PyList_Size(boundaries_obj);
    scanner.boundaries.resize(n_tids);
    for (Py_ssize_t tid = 0; tid < n_tids; ++tid) {
        PyObject *item = PyList_GetItem(boundaries_obj, tid);
        char *data; Py_ssize_t size;
        if (PyBytes_AsStringAndSize(item, &data, &size) != 0) { gzclose(gz); return nullptr; }
        const int64_t *values = (const int64_t *)data;
        scanner.boundaries[tid].assign(values, values + size / 8);
    }
    scanner.boundary_map.resize(n_tids);
    for (Py_ssize_t tid = 0; tid < n_tids; ++tid) {
        const std::vector<int64_t> &bounds = scanner.boundaries[tid];
        if (bounds.empty() || bounds.back() < 0)
            continue;
        std::vector<uint8_t> &bmap = scanner.boundary_map[tid];
        /* BIT map over 2 kb granules (8 granules/byte): 8x smaller than
         * the old byte map, so the whole-genome prefilter stays L2-ish */
        bmap.assign((size_t)((bounds.back() >> 11) >> 3) + 1, 0);
        for (int64_t value : bounds)
            if (value >= 0) {
                size_t granule = (size_t)(value >> 11);
                bmap[granule >> 3] |= (uint8_t)(1u << (granule & 7));
            }
    }
    {
        char *data; Py_ssize_t size;
        if (PyBytes_AsStringAndSize(interesting_obj, &data, &size) != 0) { gzclose(gz); return nullptr; }
        scanner.interesting.assign(data, data + size);
        if (PyBytes_AsStringAndSize(viral_obj, &data, &size) != 0) { gzclose(gz); return nullptr; }
        scanner.viral.assign(data, data + size);
    }
    scanner.viral_counts.assign(n_tids, 0);

    std::vector<Py_buffer> buffers;
    Extractor extractor;
    if (extract_obj != Py_None) {
        PyObject *gene_offsets_obj = PyTuple_GetItem(extract_obj, 0);
        PyObject *gene_items_obj = PyTuple_GetItem(extract_obj, 1);
        PyObject *gene_start_obj = PyTuple_GetItem(extract_obj, 2);
        PyObject *gene_end_obj = PyTuple_GetItem(extract_obj, 3);
        PyObject *assembly_obj = PyTuple_GetItem(extract_obj, 4);
        PyObject *tid_to_contig_obj = PyTuple_GetItem(extract_obj, 5);
        PyObject *max_itd_obj = PyTuple_GetItem(extract_obj, 6);
        if (gene_offsets_obj == nullptr || max_itd_obj == nullptr) { gzclose(gz); return nullptr; }
        auto read_int64_bytes = [&](PyObject *obj, std::vector<int64_t> &out) {
            char *data; Py_ssize_t size;
            if (PyBytes_AsStringAndSize(obj, &data, &size) != 0) return false;
            out.assign((const int64_t *)data, (const int64_t *)data + size / 8);
            return true;
        };
        extractor.gene_sets.resize(n_tids);
        for (Py_ssize_t tid = 0; tid < n_tids; ++tid) {
            if (!read_int64_bytes(PyList_GetItem(gene_offsets_obj, tid),
                                  extractor.gene_sets[tid].offsets) ||
                !read_int64_bytes(PyList_GetItem(gene_items_obj, tid),
                                  extractor.gene_sets[tid].items)) {
                gzclose(gz); return nullptr;
            }
        }
        if (!read_int64_bytes(gene_start_obj, extractor.gene_start) ||
            !read_int64_bytes(gene_end_obj, extractor.gene_end) ||
            !read_int64_bytes(tid_to_contig_obj, extractor.tid_to_contig)) {
            gzclose(gz); return nullptr;
        }
        extractor.assembly.resize(n_tids);
        for (Py_ssize_t tid = 0; tid < n_tids; ++tid) {
            PyObject *plane_obj = PyList_GetItem(assembly_obj, tid);
            if (plane_obj == Py_None)
                continue;
            Py_buffer view;
            if (PyObject_GetBuffer(plane_obj, &view, PyBUF_SIMPLE) != 0) { gzclose(gz); return nullptr; }
            buffers.push_back(view);
            extractor.assembly[tid].seq = (const uint8_t *)view.buf;
            extractor.assembly[tid].len = view.len;
        }
        extractor.max_itd_length = PyLong_AsLongLong(max_itd_obj);
        extractor.enabled = true;
        if (PyTuple_Size(extract_obj) >= 8) {
            PyObject *retain_obj = PyTuple_GetItem(extract_obj, 7);
            extractor.retain = PyObject_IsTrue(retain_obj) == 1;
        }
    }
    if (extractor.enabled)
        scanner.coll.init(1 << 16);
    else
        scanner.collated.reserve(1 << 20);  /* avoid rehash churn */
    scanner.planes.resize(n_tids);
    bool buffer_error = false;
    for (Py_ssize_t tid = 0; tid < n_tids && !buffer_error; ++tid) {
        PyObject *plane_obj = PyList_GetItem(coverage_obj, tid);
        if (plane_obj == Py_None)
            continue;
        CoveragePlane plane;
        PyObject *cov = PyTuple_GetItem(plane_obj, 0);
        PyObject *starts = PyTuple_GetItem(plane_obj, 1);
        PyObject *ends = PyTuple_GetItem(plane_obj, 2);
        Py_buffer view;
        void *data; Py_ssize_t len;
        if (!fill_plane(cov, &view, &data, &len, PyBUF_WRITABLE)) { buffer_error = true; break; }
        buffers.push_back(view);
        plane.coverage = (uint16_t *)data;
        plane.windows = view.len / 2;
        if (!fill_plane(starts, &view, &data, &len, PyBUF_WRITABLE)) { buffer_error = true; break; }
        buffers.push_back(view);
        plane.starts = (uint8_t *)data;
        if (!fill_plane(ends, &view, &data, &len, PyBUF_WRITABLE)) { buffer_error = true; break; }
        buffers.push_back(view);
        plane.ends = (uint8_t *)data;
        scanner.planes[tid] = plane;
    }
    if (buffer_error) {
        for (Py_buffer &view : buffers) PyBuffer_Release(&view);
        gzclose(gz);
        return nullptr;
    }

    /* name -> tid map (plus a view-keyed twin over stable storage, so the
     * hot scan resolves tids from line slices without a temp std::string) */
    std::unordered_map<std::string, int32_t> name_to_tid;
    std::vector<std::string> tid_name_storage;
    std::unordered_map<std::string_view, int32_t> name_to_tid_view;
    {
        PyObject *key, *value;
        Py_ssize_t dict_pos = 0;
        while (PyDict_Next(name_to_tid_obj, &dict_pos, &key, &value)) {
            name_to_tid[PyUnicode_AsUTF8(key)] = (int32_t)PyLong_AsLong(value);
        }
        tid_name_storage.reserve(name_to_tid.size());
        for (const auto &entry : name_to_tid) {
            tid_name_storage.push_back(entry.first);
            name_to_tid_view[tid_name_storage.back()] = entry.second;
        }
    }
    auto resolve_rname_view = [&](std::string_view name) -> int32_t {
        if (name.size() == 1) {
            if (name[0] == '*') return -1;
            if (name[0] == '=') return -2;  /* same as RNAME */
        }
        auto it = name_to_tid_view.find(name);
        return it == name_to_tid_view.end() ? -1 : it->second;
    };

    auto resolve_tid = [&](const std::string &line, int field) -> int32_t {
        /* extract field (2=RNAME, 6=RNEXT) */
        size_t start = 0;
        for (int i = 0; i < field; ++i) {
            start = line.find('\t', start);
            if (start == std::string::npos) return -1;
            start += 1;
        }
        size_t end = line.find('\t', start);
        std::string name = line.substr(start, end - start);
        if (name == "*") return -1;
        if (name == "=") return -2;  /* same as RNAME; caller substitutes */
        auto it = name_to_tid.find(name);
        return it == name_to_tid.end() ? -1 : it->second;
    };

    std::string header_text;
    long forwarded_records = 0;
    std::vector<std::string> bam_targets;  /* function scope: line_of outlives the BAM branch */
    const std::vector<std::string> *bam_target_names = nullptr;

    auto line_of = [&](Record &record) -> const std::string & {
        if (record.line.empty() && !record.bam_body.empty() &&
            bam_target_names != nullptr)
            bam_record_to_sam(record, *bam_target_names, record.line);
        return record.line;
    };

    auto handle_record = [&](Record &record, std::string &&read_name) {
        if (extractor.enabled) {
            handle_record_extract(scanner, extractor, record, read_name);
            return;
        }
        scanner.n_records += 1;

        /* skip unmapped like the Python loop (is_rna_bam_file mode) */
        if ((record.flag & FUNMAP) ||
            ((record.flag & FPAIRED) && (record.flag & FMUNMAP)))
            return;

        /* records Python must always see */
        if ((record.flag & (FSECONDARY | FSUPPLEMENTARY)) ||
            ((record.flag & FPAIRED) && !(record.flag & FPROPER_PAIR)) ||
            !(record.flag & FPAIRED)) {
            scanner.forwarded += line_of(record);
            scanner.forwarded += '\n';
            forwarded_records += 1;
            return;
        }

        /* proper pair: collate by read name */
        auto found = scanner.collated.find(read_name);
        if (found == scanner.collated.end()) {
            scanner.collated.emplace(std::move(read_name), std::move(record));
            return;
        }
        Record mate = std::move(found->second);
        scanner.collated.erase(found);

        if (pair_is_boring(scanner, record, mate)) {
            handle_boring_pair(scanner, record, mate);
        } else {
            scanner.forwarded += line_of(mate);
            scanner.forwarded += '\n';
            scanner.forwarded += line_of(record);
            scanner.forwarded += '\n';
            forwarded_records += 2;
        }
    };

    /* sharded extraction (threads > 1): records are pinned to a shard by the
     * hash of their read name, so mate collation / supplementary joins / ITD
     * fragments all meet inside one shard. Every reduction commutes (counter
     * sums, idempotent flag stores, saturating coverage adds behind
     * atomic_coverage, and the fragment table is name-sorted downstream), so
     * the result is byte-identical to the serial scan at any shard count. */
    int n_shards = 0;
    if (extractor.enabled && shard_mode != 2) {
        /* one shard per core up to 16 (work-stealing parse tiles keep the
         * tail small; collation and coverage merge are shard-count
         * invariant, so the only cost of more shards is their state).
         * threads == 1 also runs this machinery with a single shard — the
         * mmap chunk reader, AVX2 sweep, batch parse, and boring-pair
         * consume are all much faster than the per-line fallback, and with
         * one shard no pool or reader thread is spawned (genuinely
         * single-threaded) */
        int hw = (int)std::thread::hardware_concurrency();
        n_shards = std::max(1, std::min(threads, 16));
        const char *cap = getenv("ARRIBA_TPU_SCAN_SHARDS");
        if (cap != nullptr && atoi(cap) > 0)
            n_shards = std::min(n_shards, atoi(cap));
        else if (hw > 1)
            n_shards = std::min(n_shards, std::max(1, hw));
    }
    std::vector<Scanner> shard_sc;
    std::vector<Extractor> shard_ex;
    /* private per-shard coverage planes when affordable: shared planes cost
     * an atomic RMW per window increment (~10M per 2M records) contending
     * on hot cache lines. Per-shard planes merged once at the end are
     * byte-identical — every increment is +1, so clamping a wide sum at the
     * merge equals per-increment saturation, and the start/end flags OR.
     * Falls back to shared+atomic when the copies would be too large
     * (human-scale genomes: ~640 MB per shard at 20 bp resolution). */
    size_t plane_bytes = 0;
    int64_t total_windows = 0;
    bool plane_fits_bins = (Py_ssize_t)scanner.planes.size() < (1 << 14);
    for (const CoveragePlane &plane : scanner.planes) {
        plane_bytes += (size_t)plane.windows * 4;
        total_windows += plane.windows;
        if ((uint64_t)plane.windows > 0xFFFFFFFFull)
            plane_fits_bins = false;
    }
    /* binned coverage (CoverageBins above) is the default whenever the
     * planes are big enough that write-through scatters past the LLC
     * (~8 MB); it supersedes both the private-plane copies and shared
     * atomic CAS. ARRIBA_TPU_COVERAGE_BINS=0/1 forces it off/on,
     * ARRIBA_TPU_PRIVATE_PLANES picks the legacy mechanism when bins are
     * off. */
    bool use_bins = plane_fits_bins && plane_bytes >= ((size_t)8 << 20);
    {
        const char *env = getenv("ARRIBA_TPU_COVERAGE_BINS");
        if (env != nullptr)
            use_bins = plane_fits_bins && atoi(env) != 0;
    }
    bool private_planes =
        !use_bins && n_shards > 0 &&
        plane_bytes * (size_t)n_shards <= ((size_t)256 << 20);
    {
        const char *env = getenv("ARRIBA_TPU_PRIVATE_PLANES");
        if (env != nullptr && n_shards > 0 && !use_bins)
            private_planes = atoi(env) != 0;
    }
    std::unique_ptr<std::atomic<uint32_t>[]> granule_locks;
    if (use_bins && n_shards > 0)
        granule_locks.reset(new std::atomic<uint32_t>[(
            size_t)((total_windows >> CoverageBins::GRANULE_BITS) + 1)]());
    if (use_bins)
        scanner.bins.init(scanner.planes,
                          granule_locks.get());  /* null when serial */
    /* [s * n_tids + tid] backing storage, empty where the master has none */
    std::vector<std::vector<uint16_t>> priv_cov;
    std::vector<std::vector<uint8_t>> priv_starts, priv_ends;
    if (n_shards > 0) {
        scanner.atomic_coverage = !use_bins;
        shard_sc.resize(n_shards);
        shard_ex.resize(n_shards);
        if (private_planes) {
            priv_cov.resize((size_t)n_shards * n_tids);
            priv_starts.resize((size_t)n_shards * n_tids);
            priv_ends.resize((size_t)n_shards * n_tids);
        }
        for (int s = 0; s < n_shards; ++s) {
            shard_sc[s].planes = scanner.planes;
            if (use_bins)
                shard_sc[s].bins.init(shard_sc[s].planes,
                                      granule_locks.get());
            if (private_planes) {
                for (Py_ssize_t tid = 0; tid < n_tids; ++tid) {
                    CoveragePlane &plane = shard_sc[s].planes[tid];
                    if (plane.windows == 0 || plane.coverage == nullptr)
                        continue;
                    size_t at = (size_t)s * n_tids + tid;
                    priv_cov[at].assign((size_t)plane.windows, 0);
                    priv_starts[at].assign((size_t)plane.windows, 0);
                    priv_ends[at].assign((size_t)plane.windows, 0);
                    plane.coverage = priv_cov[at].data();
                    plane.starts = priv_starts[at].data();
                    plane.ends = priv_ends[at].data();
                }
            }
            shard_sc[s].boundaries = scanner.boundaries;
            shard_sc[s].boundary_map = scanner.boundary_map;
            shard_sc[s].interesting = scanner.interesting;
            shard_sc[s].viral = scanner.viral;
            shard_sc[s].viral_counts.assign(n_tids, 0);
            shard_sc[s].external_duplicate_marking =
                scanner.external_duplicate_marking;
            shard_sc[s].atomic_coverage = !private_planes && !use_bins;
            shard_sc[s].coll.init((1 << 17) / n_shards);
            shard_ex[s] = extractor;  /* read-only tables; empty fragments */
        }
    }
    std::hash<std::string_view> shard_hash;

    if (shard_mode == 2) {
        /* master merge: adopt the workers' fragment blobs, replay their
         * leftover (range-boundary / unpaired) records through the exact
         * handle path, then fall through to the normal tail. Counters the
         * workers already tallied at record arrival (n_records,
         * mapped_reads, missing_hi) are zeroed after the replay so the
         * Python caller can sum worker + merge results without double
         * counting; pair-completion effects (coverage, viral pristine
         * counts, extracted fragments) happen only here. */
        gzclose(gz);
        if (!extractor.enabled) {
            PyErr_SetString(PyExc_ValueError,
                            "shard merge requires extraction mode");
            goto merge_fail;
        }
        {
            /* adopt the workers' fragments in CREATION (file) order and
             * merge partial same-name fragments: a chimeric fragment whose
             * records straddle a stripe boundary was extracted piecewise by
             * two workers; appending the later piece's mates onto the
             * earlier piece reproduces the single-process mate list. The
             * by_name index is built here so the leftover replay extends
             * these fragments instead of creating duplicates. */
            std::vector<FragmentData> adopted;
            std::vector<int64_t> adopted_pos;
            for (Py_ssize_t b = 0; b < PyList_Size(merge_frag_blobs); ++b) {
                char *data; Py_ssize_t size;
                if (PyBytes_AsStringAndSize(
                        PyList_GetItem(merge_frag_blobs, b), &data,
                        &size) != 0)
                    goto merge_fail;
                if (!deserialize_fragments(data, (size_t)size, adopted,
                                           adopted_pos)) {
                    PyErr_SetString(PyExc_ValueError,
                                    "corrupt shard fragment blob");
                    goto merge_fail;
                }
            }
            std::vector<uint32_t> order(adopted.size());
            for (uint32_t i = 0; i < (uint32_t)order.size(); ++i)
                order[i] = i;
            std::stable_sort(order.begin(), order.end(),
                             [&](uint32_t a, uint32_t b) {
                                 return adopted_pos[a] < adopted_pos[b];
                             });
            for (uint32_t i : order) {
                FragmentData &incoming = adopted[i];
                extractor.current_file_pos = adopted_pos[i];
                FragmentData &target = fragment_for(extractor, incoming.name);
                if (target.mates.empty()) {
                    target.single_end = incoming.single_end;
                    target.duplicate = incoming.duplicate;
                    target.mates = std::move(incoming.mates);
                } else {
                    target.single_end |= incoming.single_end;
                    target.duplicate |= incoming.duplicate;
                    for (AlignmentData &mate : incoming.mates)
                        target.mates.push_back(std::move(mate));
                }
            }
        }
        {
            /* replay cross-boundary leftovers in input order: the pair
             * classification (add_fragment's flag choice, mate roles) is
             * arrival-order-sensitive, and single-process arrival order is
             * file order */
            std::vector<std::pair<std::string, Record>> leftovers;
            for (Py_ssize_t b = 0; b < PyList_Size(merge_leftover_blobs);
                 ++b) {
                char *data; Py_ssize_t size;
                if (PyBytes_AsStringAndSize(
                        PyList_GetItem(merge_leftover_blobs, b), &data,
                        &size) != 0)
                    goto merge_fail;
                BlobCursor cur{data, data + size};
                int64_t n = cur.i64();
                for (int64_t i = 0; i < n && cur.ok; ++i) {
                    leftovers.emplace_back();
                    if (!deserialize_leftover(cur, leftovers.back().first,
                                              leftovers.back().second))
                        break;
                }
                if (!cur.ok) {
                    PyErr_SetString(PyExc_ValueError,
                                    "corrupt shard leftover blob");
                    goto merge_fail;
                }
            }
            std::stable_sort(leftovers.begin(), leftovers.end(),
                             [](const std::pair<std::string, Record> &a,
                                const std::pair<std::string, Record> &b) {
                                 return a.second.file_pos < b.second.file_pos;
                             });
            for (auto &entry : leftovers)
                handle_record_extract(scanner, extractor, entry.second,
                                      std::string_view(entry.first));
        }
        scanner.n_records = 0;
        extractor.mapped_reads = 0;
        extractor.missing_hi = 0;
        goto done;
    merge_fail:
        for (Py_buffer &view : buffers)
            PyBuffer_Release(&view);
        return nullptr;
    }

    /* sniff the (decompressed) leading bytes: BAM or SAM text (already
     * done by scan_open when resuming) */
    bool is_bam;
    if (resume) {
        is_bam = resume_is_bam;
        header_text = resume_header;
    } else {
        char magic[4] = {0, 0, 0, 0};
        int magic_got = gzread(gz, magic, 4);
        is_bam = (magic_got == 4 && memcmp(magic, "BAM\1", 4) == 0);
    }

    if (is_bam) {
        /* multithreaded BGZF decompression when requested (the reference's
         * -@ decompression pool); a resumed non-seekable stream (pipe) can
         * only be read serially from the handle scan_open() left open —
         * reopening the path would steal bytes from the pipe */
        FILE *raw_file = nullptr;
        bgzf_parallel::Reader *parallel = nullptr;
        if (threads > 1 && (!resume || resume_regular)) {
            raw_file = fopen(path, "rb");
            if (raw_file != nullptr && bgzf_parallel::Reader::is_bgzf(raw_file)) {
                /* inflate workers sleep when the ring is full, so the
                 * shard pool and the inflate pool can share the full
                 * budget; phases interleave instead of competing */
                int bgzf_threads = threads;
                parallel = new bgzf_parallel::Reader(raw_file, bgzf_threads);
                char bam_magic[4];
                parallel->read_exact(bam_magic, 4);  /* skip "BAM\1" */
            } else if (raw_file != nullptr) {
                fclose(raw_file);
                raw_file = nullptr;
            }
        }
        GzBlockReader serial(gz);
        auto read_exact = [&](void *data, size_t n) {
            return parallel ? parallel->read_exact(data, n)
                            : serial.read_exact(data, n);
        };
        struct Cleanup {
            FILE *file; bgzf_parallel::Reader *reader; std::string *error_out;
            ~Cleanup() {
                if (reader) reader->join_prefetch();
                if (reader && !reader->error().empty() && error_out->empty())
                    *error_out = reader->error();
                delete reader;
                if (file) fclose(file);
            }
        } cleanup{raw_file, parallel, &stream_error};

        if (resume && parallel == nullptr) {
            /* scan_open() already consumed the header from this stream */
            bam_targets = std::move(resume_targets);
        } else {
            int32_t l_text = 0;
            if (!read_exact(&l_text, 4)) { gzclose(gz); goto done; }
            if (l_text < 0) {
                stream_error = "corrupt BAM header (negative l_text)";
                gzclose(gz); goto done;
            }
            {
                std::vector<char> text(l_text);
                if (l_text && !read_exact(text.data(), l_text)) { gzclose(gz); goto done; }
                header_text.assign(text.data(), strnlen(text.data(), l_text));
            }
            int32_t n_ref = 0;
            if (!read_exact(&n_ref, 4)) { gzclose(gz); goto done; }
            if (n_ref < 0) {
                stream_error = "corrupt BAM header (negative n_ref)";
                gzclose(gz); goto done;
            }
            bam_targets.resize(n_ref);
            for (int32_t i = 0; i < n_ref; ++i) {
                int32_t l_name = 0, l_ref = 0;
                if (!read_exact(&l_name, 4)) { gzclose(gz); goto done; }
                if (l_name <= 0) {
                    stream_error = "corrupt BAM header (bad l_name)";
                    gzclose(gz); goto done;
                }
                std::vector<char> name(l_name);
                if (!read_exact(name.data(), l_name)) { gzclose(gz); goto done; }
                if (!read_exact(&l_ref, 4)) { gzclose(gz); goto done; }
                bam_targets[i].assign(name.data(), strnlen(name.data(), l_name));
            }
        }
        bam_target_names = &bam_targets;
        std::atomic<long> bad_bam_records{0};
        if (threads > 1 || n_shards > 0) {
            /* batch-parallel decode: bodies read serially, decoded by a
             * worker pool, handled sequentially in order */
            const size_t BATCH = 32768;
            if (n_shards > 0) {
                /* double-buffered shard pipeline (see the SAM branch) */
                struct BamBatch {
                    std::vector<std::vector<uint8_t>> bodies;
                    std::vector<Record> decoded;
                    std::vector<uint8_t> ok;
                    std::vector<uint16_t> shard;
                    std::vector<std::vector<uint32_t>> by_shard;
                    std::atomic<uint32_t> next_tile{0};
                    size_t count = 0;
                };
                BamBatch buffers[2];
                for (BamBatch &batch : buffers) {
                    batch.bodies.resize(BATCH);
                    batch.decoded.resize(BATCH);
                    batch.ok.resize(BATCH);
                    batch.shard.resize(BATCH);
                    batch.by_shard.resize(n_shards);
                    for (auto &list : batch.by_shard) list.reserve(BATCH);
                }
                bool eof = false;
                auto read_batch = [&](BamBatch &batch) {
                    batch.count = 0;
                    batch.next_tile.store(0, std::memory_order_relaxed);
                    while (batch.count < BATCH) {
                        int32_t block_size = 0;
                        if (!read_exact(&block_size, 4) || block_size <= 0) {
                            eof = true;
                            break;
                        }
                        batch.bodies[batch.count].resize(block_size);
                        if (!read_exact(batch.bodies[batch.count].data(),
                                        block_size)) {
                            if (stream_error.empty() &&
                                (!parallel || parallel->error().empty()))
                                stream_error = "truncated BAM record "
                                               "(unexpected end of stream)";
                            eof = true;
                            break;
                        }
                        batch.count += 1;
                    }
                };
                const bool bam_timing =
                    getenv("ARRIBA_TPU_SCAN_TIMING") != nullptr;
                auto bam_now = []() {
                    struct timespec ts;
                    clock_gettime(CLOCK_MONOTONIC, &ts);
                    return ts.tv_sec + ts.tv_nsec * 1e-9;
                };
                double bam_read = 0, bam_pool = 0;
                double bam_t0 = bam_timing ? bam_now() : 0;
                read_batch(buffers[0]);
                if (bam_timing) bam_read += bam_now() - bam_t0;
                int cur = 0;
                while (buffers[cur].count > 0) {
                    BamBatch &batch = buffers[cur];
                    std::atomic<uint32_t> tiles_done{0};
                    std::atomic<bool> partitioned{false};
                    std::vector<std::thread> pool;
                    auto shard_worker = [&](int s) {
                            /* work-stealing 256-record decode tiles (like
                             * the SAM branch): the pool drains the batch
                             * while the main thread reads the next one,
                             * adjacent boring pairs are consumed in place,
                             * and whoever decodes the last tile partitions */
                            const uint32_t TILE = 256;
                            const uint32_t n_tiles =
                                (uint32_t)((batch.count + TILE - 1) / TILE);
                            auto qname_of = [&](size_t i) {
                                return std::string_view(
                                    (const char *)batch.decoded[i]
                                        .bam_body.data() + 32);
                            };
                            for (;;) {
                                size_t lo =
                                    (size_t)batch.next_tile.fetch_add(
                                        1, std::memory_order_relaxed)
                                    * TILE;
                                if (lo >= batch.count) break;
                                size_t hi = std::min(batch.count, lo + TILE);
                                for (size_t i = lo; i < hi; ++i) {
                                    batch.ok[i] = decode_bam_record(
                                        batch.bodies[i], batch.decoded[i])
                                                      ? 1 : 0;
                                    if (batch.ok[i]) {
                                        /* hand the body over (swap keeps
                                         * both buffers' capacity recycled)
                                         * instead of a ~200B copy/record */
                                        batch.decoded[i].bam_body.swap(
                                            batch.bodies[i]);
                                        batch.shard[i] = (uint16_t)(
                                            shard_hash(std::string_view(
                                                (const char *)batch.decoded[i]
                                                    .bam_body.data() + 32))
                                            % n_shards);
                                    }
                                }
                                for (size_t i = lo; i + 1 < hi; ++i) {
                                    if (batch.ok[i] != 1 ||
                                        batch.ok[i + 1] != 1)
                                        continue;
                                    if (consume_adjacent_boring_pair(
                                            shard_sc[s], shard_ex[s],
                                            batch.decoded[i],
                                            batch.decoded[i + 1],
                                            qname_of(i), qname_of(i + 1))) {
                                        batch.ok[i] = 2;
                                        batch.ok[i + 1] = 2;
                                        ++i;
                                    }
                                }
                                if (tiles_done.fetch_add(
                                        1, std::memory_order_acq_rel)
                                    + 1 == n_tiles) {
                                    for (auto &list : batch.by_shard)
                                        list.clear();
                                    long bad = 0;
                                    for (size_t i = 0; i < batch.count; ++i) {
                                        if (batch.ok[i] == 1)
                                            batch.by_shard[batch.shard[i]]
                                                .push_back((uint32_t)i);
                                        else if (batch.ok[i] == 0)
                                            ++bad;
                                    }
                                    if (bad)
                                        bad_bam_records.fetch_add(
                                            bad, std::memory_order_relaxed);
                                    partitioned.store(
                                        true, std::memory_order_release);
                                }
                            }
                            while (!partitioned.load(
                                std::memory_order_acquire))
                                std::this_thread::yield();
                            for (uint32_t i : batch.by_shard[s]) {
                                handle_record_extract(
                                    shard_sc[s], shard_ex[s], batch.decoded[i],
                                    std::string_view((const char *)batch
                                                         .decoded[i]
                                                         .bam_body.data() +
                                                     32));
                            }
                        };
                    double pool_t0 = bam_timing ? bam_now() : 0;
                    /* batch k+1 reads on its own thread (draining the BGZF
                     * prefetch pipeline) so shard 0 joins the pool
                     * immediately; the reader owns eof/stream_error and
                     * buffers[1-cur], ordered by the join below */
                    std::thread reader;
                    if (!eof && n_shards > 1) {
                        double read_t0 = bam_timing ? bam_now() : 0;
                        reader = std::thread([&, read_t0]() {
                            read_batch(buffers[1 - cur]);
                            if (bam_timing) bam_read += bam_now() - read_t0;
                        });
                    } else if (eof) {
                        buffers[1 - cur].count = 0;
                    }
                    for (int s = 1; s < n_shards; ++s)
                        pool.emplace_back(shard_worker, s);
                    shard_worker(0);
                    for (std::thread &worker : pool)
                        worker.join();
                    if (reader.joinable())
                        reader.join();
                    else if (!eof && n_shards == 1) {
                        /* single shard: stay genuinely single-threaded */
                        double read_t0 = bam_timing ? bam_now() : 0;
                        read_batch(buffers[1 - cur]);
                        if (bam_timing) bam_read += bam_now() - read_t0;
                    }
                    if (bam_timing) bam_pool += bam_now() - pool_t0;
                    cur = 1 - cur;
                }
                if (bam_timing)
                    fprintf(stderr, "bam scan timing: pool=%.2fs read=%.2fs\n",
                            bam_pool, bam_read);
            } else {
            std::vector<std::vector<uint8_t>> bodies(BATCH);
            std::vector<Record> decoded(BATCH);
            std::vector<uint8_t> ok(BATCH);
            bool eof = false;
            while (!eof) {
                size_t count = 0;
                while (count < BATCH) {
                    int32_t block_size = 0;
                    if (!read_exact(&block_size, 4) || block_size <= 0) { eof = true; break; }
                    bodies[count].resize(block_size);
                    if (!read_exact(bodies[count].data(), block_size)) {
                        /* mid-record EOF: the stream promised block_size more
                         * bytes — truncation, not a clean end */
                        if (stream_error.empty() &&
                            (!parallel || parallel->error().empty()))
                            stream_error = "truncated BAM record (unexpected "
                                           "end of stream)";
                        eof = true;
                        break;
                    }
                    count += 1;
                }
                int n_workers = std::min(threads, 8);
                std::vector<std::thread> pool;
                for (int w = 0; w < n_workers; ++w)
                    pool.emplace_back([&, w]() {
                        for (size_t i = w; i < count; i += n_workers) {
                            ok[i] = decode_bam_record(bodies[i], decoded[i]) ? 1 : 0;
                            if (ok[i])
                                decoded[i].bam_body.swap(bodies[i]);
                        }
                    });
                for (std::thread &worker : pool)
                    worker.join();
                for (size_t i = 0; i < count; ++i) {
                    if (!ok[i]) {
                        bad_bam_records.fetch_add(1,
                                                  std::memory_order_relaxed);
                        continue;
                    }
                    std::string read_name((const char *)decoded[i].bam_body.data() + 32);
                    handle_record(decoded[i], std::move(read_name));
                }
            }
            }
        } else {
            Record record;
            for (;;) {
                int32_t block_size = 0;
                if (!read_exact(&block_size, 4)) break;  /* EOF */
                if (block_size <= 0) break;
                record.bam_body.resize(block_size);
                if (!read_exact(record.bam_body.data(), block_size)) {
                    if (stream_error.empty() &&
                        (!parallel || parallel->error().empty()))
                        stream_error = "truncated BAM record (unexpected end "
                                       "of stream)";
                    break;
                }
                if (!decode_bam_record(record.bam_body, record)) {
                    bad_bam_records.fetch_add(1, std::memory_order_relaxed);
                    continue;
                }
                std::string read_name((const char *)record.bam_body.data() + 32);
                handle_record(record, std::move(read_name));
            }
        }
        if (!parallel && serial.corrupt() && stream_error.empty())
            stream_error = "corrupt gzip/BGZF stream in BAM input";
        if (bad_bam_records.load(std::memory_order_relaxed) > 0
            && stream_error.empty())
            stream_error = "corrupt BAM record (failed validation: bad aux "
                           "region, name terminator, or field bounds)";
        gzclose(gz);
    } else {
        /* resumed streams (pipes) cannot rewind: scan_open() consumed the
         * header and hands us the overshoot bytes as the reader preload */
        if (!resume && gzrewind(gz) != 0) {
            /* non-seekable input without scan_open: the 4 sniffed magic
             * bytes are unrecoverable — fail loudly instead of parsing a
             * stream whose first line is missing its first characters */
            stream_error = "cannot rewind non-seekable SAM input "
                           "(open pipes via scan_open + resume)";
            gzclose(gz);
            goto done;
        }
        GzLineReader reader(gz, resume_carry);
        if (threads > 1 || n_shards > 0) {
            /* batch-parallel parse: lines read serially, parsed by a worker
             * pool, handled sequentially in order */
            const size_t BATCH = 32768;
            if (n_shards > 0) {
                /* double-buffered shard pipeline over whole-line CHUNKS: the
                 * reader thread fills an ~8 MB chunk (zero per-line copies),
                 * workers parse string_view slices (strided), the last
                 * worker at the yield-barrier partitions records into
                 * per-shard index lists, then each worker handles only its
                 * own shard; the reader overlaps the next chunk under both
                 * phases */
                size_t CHUNK = 8u << 20;
                if (const char *env = getenv("ARRIBA_TPU_SCAN_CHUNK_KB"))
                    if (atoi(env) > 0)
                        CHUNK = (size_t)atoi(env) << 10;
                struct SamBatch {
                    std::string data;
                    const char *src = nullptr;  /* line base: mapped chunk
                                                   or data.data() */
                    size_t chunk_len = 0;
                    int64_t file_base = 0;  /* chunk's input byte offset */
                    std::vector<std::pair<uint32_t, uint32_t>> spans;
                    std::vector<Record> decoded;
                    std::vector<RecordLite> lites;
                    std::vector<uint8_t> ok;
                    std::vector<uint16_t> shard;
                    std::vector<std::vector<uint32_t>> by_shard;
                    size_t count = 0;
                    bool has_data = false;
                    /* work-stealing parse cursor: the main thread joins the
                     * parse late (after reading the next chunk), so static
                     * blocks would leave the pool spinning at the barrier
                     * for the duration of the read */
                    std::atomic<uint32_t> next_tile{0};
                    /* lazy parallel newline sweep (mmap chunks only): the
                     * workers claim byte tiles and cut lines into per-tile
                     * span lists; the last tile's worker concatenates them
                     * in order (identical spans to the serial sweep) and
                     * releases `swept`. Stream chunks sweep in read_batch
                     * as before and start with swept=true. */
                    std::vector<std::vector<std::pair<uint32_t, uint32_t>>>
                        tile_spans;
                    std::vector<std::string> tile_headers;
                    size_t n_sweep_tiles = 0;
                    std::atomic<uint32_t> next_sweep{0};
                    std::atomic<uint32_t> sweeps_done{0};
                    std::atomic<bool> swept{true};
                };
                const size_t SWEEP_TILE = 512u << 10;
                SamBatch buffers[2];
                for (SamBatch &batch : buffers) {
                    batch.data.reserve(CHUNK + (1 << 20));
                    batch.by_shard.resize(n_shards);
                }
                GzChunkReader chunk_reader(gz, resume_carry);
                bool done = false;
                /* plain regular files skip zlib entirely: map once, hand out
                 * chunk views (resume mode keeps the stream reader — the
                 * header bytes were already consumed from the gz handle) */
                MappedFile mapped;
                size_t map_pos = 0;
                if (!resume && gzdirect(gz))
                    mapped.open_file(path);
                size_t map_end = mapped.ok() ? mapped.size() : 0;
                /* worker stripes: this worker owns stripes j with
                 * j % n_procs == worker_idx; a line belongs to the stripe
                 * containing its FIRST byte, and every stripe edge uses the
                 * same "first line start >= X" rule, so the workers tile
                 * the file exactly */
                int64_t stripe_j = 0;
                auto first_line_start = [&](int64_t at) -> size_t {
                    if (at <= 0) return 0;
                    if ((size_t)at >= mapped.size()) return mapped.size();
                    const char *nl = (const char *)memchr(
                        mapped.data() + at - 1, '\n',
                        mapped.size() - (size_t)(at - 1));
                    return nl ? (size_t)(nl - mapped.data()) + 1
                              : mapped.size();
                };
                auto enter_stripe = [&]() {
                    map_pos = first_line_start(stripe_j * shard_stripe);
                    map_end =
                        first_line_start((stripe_j + 1) * shard_stripe);
                };
                if (shard_mode == 1) {
                    if (!mapped.ok()) {
                        stream_error = "sharded ingest requires a plain "
                                       "uncompressed seekable SAM file";
                        gzclose(gz);
                        goto done;
                    }
                    stripe_j = shard_start;  /* worker_idx */
                    enter_stripe();
                }

                auto read_batch = [&](SamBatch &batch) {
                    batch.count = 0;
                    batch.has_data = false;
                    batch.spans.clear();
                    const char *base;
                    size_t n;
                    if (mapped.ok()) {
                        while (shard_mode == 1 && !done
                               && map_pos >= map_end) {
                            stripe_j += shard_end;  /* n_procs */
                            if ((size_t)(stripe_j * shard_stripe)
                                >= mapped.size()) {
                                done = true;
                                break;
                            }
                            enter_stripe();
                        }
                        if (done || map_pos >= map_end) {
                            done = true;
                            return;
                        }
                        size_t end = std::min(map_pos + CHUNK, map_end);
                        if (end < map_end) {
                            /* cut the chunk at a line boundary */
                            const char *nl = (const char *)memchr(
                                mapped.data() + end, '\n',
                                map_end - end);
                            end = nl ? (size_t)(nl - mapped.data()) + 1
                                     : map_end;
                        }
                        base = mapped.data() + map_pos;
                        n = end - map_pos;
                        batch.file_base = (int64_t)map_pos;
                        map_pos = end;
                        /* defer the newline sweep to the worker pool */
                        batch.src = base;
                        batch.chunk_len = n;
                        batch.has_data = n > 0;
                        batch.n_sweep_tiles = (n + SWEEP_TILE - 1) / SWEEP_TILE;
                        if (batch.tile_spans.size() < batch.n_sweep_tiles) {
                            batch.tile_spans.resize(batch.n_sweep_tiles);
                            batch.tile_headers.resize(batch.n_sweep_tiles);
                        }
                        batch.next_sweep.store(0, std::memory_order_relaxed);
                        batch.sweeps_done.store(0, std::memory_order_relaxed);
                        batch.swept.store(false, std::memory_order_release);
                        return;
                    } else {
                        if (done || !chunk_reader.next_chunk(batch.data,
                                                             CHUNK)) {
                            done = true;
                            return;
                        }
                        base = batch.data.data();
                        n = batch.data.size();
                    }
                    batch.src = base;
                    batch.chunk_len = n;
                    batch.swept.store(true, std::memory_order_relaxed);
                    size_t pos = 0;
                    /* one AVX2 sweep collects every newline offset (32
                     * bytes / compare) instead of a memchr call per line */
                    auto cut_line = [&](size_t end) {
                        size_t len = end - pos;
                        if (len > 0 && base[pos + len - 1] == '\r') len -= 1;
                        if (len == 0) {
                        } else if (base[pos] == '@') {
                            header_text.append(base + pos, len);
                            header_text += '\n';
                        } else {
                            batch.spans.emplace_back((uint32_t)pos,
                                                     (uint32_t)len);
                        }
                        pos = end + 1;
                    };
                    if (cpu_has_avx2()) {
                        newline_sweep_avx2(base, n, cut_line);
                    } else {
                        while (pos < n) {
                            const char *nl = (const char *)memchr(
                                base + pos, '\n', n - pos);
                            cut_line(nl ? (size_t)(nl - base) : n);
                        }
                    }
                    if (pos < n)
                        cut_line(n);
                    batch.count = batch.spans.size();
                    batch.has_data = batch.count > 0;
                    if (batch.decoded.size() < batch.count) {
                        batch.decoded.resize(batch.count);
                        batch.lites.resize(batch.count);
                        batch.ok.resize(batch.count);
                        batch.shard.resize(batch.count);
                    }
                    batch.next_tile.store(0, std::memory_order_relaxed);
                };

                const char *timing_env = getenv("ARRIBA_TPU_SCAN_TIMING");
                const bool timing = timing_env != nullptr;
                g_handle_timing = timing && atoi(timing_env) >= 2;
                g_t_name = g_t_pend = g_t_boring = g_t_cov = g_t_chim = 0;
                g_t_parse_only = g_t_consume = g_n_consumed = 0;
                g_n_pairs = g_n_pend_hit = 0;
                auto now = []() {
                    struct timespec ts;
                    clock_gettime(CLOCK_MONOTONIC, &ts);
                    return ts.tv_sec + ts.tv_nsec * 1e-9;
                };
                double t_read = 0, t_pool = 0, t_parse0 = 0, t_handle0 = 0,
                       t_barrier0 = 0;
                double t_start = timing ? now() : 0;
                read_batch(buffers[0]);
                if (timing) t_read += now() - t_start;
                int cur = 0;
                while (buffers[cur].has_data) {
                    SamBatch &batch = buffers[cur];
                    std::atomic<uint32_t> tiles_done{0};
                    std::atomic<bool> partitioned{false};
                    double t_pool_start = timing ? now() : 0;
                    /* shards 1..n-1 run on the pool; the main thread reads
                     * the next chunk, then works shard 0 itself — every
                     * core gets a shard with no oversubscription */
                    std::vector<std::thread> pool;
                    auto shard_worker = [&](int s) {
                            double w0 = (timing && s == 0) ? now() : 0;
                            const char *base = batch.src;
                            /* phase 0 — parallel newline sweep of an mmap
                             * chunk: byte tiles claimed work-stealing; the
                             * last tile's worker concatenates the per-tile
                             * span lists in tile order (identical result to
                             * the serial sweep) and releases the barrier */
                            if (!batch.swept.load(std::memory_order_acquire)) {
                                const size_t n = batch.chunk_len;
                                for (;;) {
                                    uint32_t t = batch.next_sweep.fetch_add(
                                        1, std::memory_order_relaxed);
                                    if (t >= batch.n_sweep_tiles) break;
                                    size_t tS = (size_t)t * SWEEP_TILE;
                                    size_t tE = std::min(n, tS + SWEEP_TILE);
                                    auto &spans = batch.tile_spans[t];
                                    spans.clear();
                                    std::string &hdr = batch.tile_headers[t];
                                    hdr.clear();
                                    size_t pos;
                                    if (t == 0) {
                                        pos = 0;
                                    } else {
                                        const char *nl = (const char *)memchr(
                                            base + tS - 1, '\n', n - (tS - 1));
                                        pos = nl ? (size_t)(nl - base) + 1 : n;
                                    }
                                    /* lines whose START lies in [tS, tE) */
                                    while (pos < tE) {
                                        const char *nl = (const char *)memchr(
                                            base + pos, '\n', n - pos);
                                        size_t end =
                                            nl ? (size_t)(nl - base) : n;
                                        size_t len = end - pos;
                                        if (len > 0 &&
                                            base[pos + len - 1] == '\r')
                                            len -= 1;
                                        if (len == 0) {
                                        } else if (base[pos] == '@') {
                                            hdr.append(base + pos, len);
                                            hdr += '\n';
                                        } else {
                                            spans.emplace_back((uint32_t)pos,
                                                               (uint32_t)len);
                                        }
                                        pos = end + 1;
                                    }
                                    if (batch.sweeps_done.fetch_add(
                                            1, std::memory_order_acq_rel)
                                        + 1 == batch.n_sweep_tiles) {
                                        size_t total = 0;
                                        for (uint32_t tt = 0;
                                             tt < batch.n_sweep_tiles; ++tt)
                                            total +=
                                                batch.tile_spans[tt].size();
                                        batch.spans.clear();
                                        batch.spans.reserve(total);
                                        for (uint32_t tt = 0;
                                             tt < batch.n_sweep_tiles; ++tt) {
                                            batch.spans.insert(
                                                batch.spans.end(),
                                                batch.tile_spans[tt].begin(),
                                                batch.tile_spans[tt].end());
                                            if (!batch.tile_headers[tt]
                                                     .empty())
                                                header_text +=
                                                    batch.tile_headers[tt];
                                        }
                                        batch.count = batch.spans.size();
                                        if (batch.decoded.size()
                                            < batch.count) {
                                            batch.decoded.resize(batch.count);
                                            batch.lites.resize(batch.count);
                                            batch.ok.resize(batch.count);
                                            batch.shard.resize(batch.count);
                                        }
                                        batch.next_tile.store(
                                            0, std::memory_order_relaxed);
                                        batch.swept.store(
                                            true, std::memory_order_release);
                                    }
                                }
                                while (!batch.swept.load(
                                    std::memory_order_acquire))
                                    std::this_thread::yield();
                            }
                            /* 2-entry MRU memo for RNAME -> tid: aligner
                             * output is clustered by contig, so this
                             * replaces the per-record hash-map lookup with
                             * a short byte compare almost always */
                            std::string memo_name[2];
                            int32_t memo_tid[2] = {INT32_MIN, INT32_MIN};
                            auto rname_tid = [&](std::string_view rn)
                                -> int32_t {
                                if (memo_tid[0] != INT32_MIN &&
                                    rn == memo_name[0])
                                    return memo_tid[0];
                                if (memo_tid[1] != INT32_MIN &&
                                    rn == memo_name[1]) {
                                    std::swap(memo_name[0], memo_name[1]);
                                    std::swap(memo_tid[0], memo_tid[1]);
                                    return memo_tid[0];
                                }
                                int32_t tid = resolve_rname_view(rn);
                                memo_name[1].assign(rn.data(), rn.size());
                                memo_tid[1] = tid;
                                std::swap(memo_name[0], memo_name[1]);
                                std::swap(memo_tid[0], memo_tid[1]);
                                return tid;
                            };
                            /* work-stealing 256-record tiles: the pool
                             * drains the chunk while the main thread is
                             * still reading; whoever is free parses next
                             * (contiguous within a tile — no false sharing
                             * on the byte-wide ok/shard arrays) */
                            const uint32_t TILE = 256;
                            const uint32_t n_tiles =
                                (uint32_t)((batch.count + TILE - 1) / TILE);
                            if (n_tiles == 0)  /* header-only chunk */
                                partitioned.store(true,
                                                  std::memory_order_release);
                            for (;;) {
                                size_t lo =
                                    (size_t)batch.next_tile.fetch_add(
                                        1, std::memory_order_relaxed)
                                    * TILE;
                                if (lo >= batch.count) break;
                                size_t hi =
                                    std::min(batch.count, lo + TILE);
                                for (size_t i = lo; i < hi; ++i) {
                                const char *line = base + batch.spans[i].first;
                                size_t len = batch.spans[i].second;
                                uint64_t pt0 = g_handle_timing
                                                   ? handle_tsc() : 0;
                                /* slim triage parse: full Records are
                                 * materialized below only for records the
                                 * lite boring-pair consume leaves over */
                                batch.ok[i] = parse_sam_lite(
                                    line, len, batch.lites[i]) ? 1 : 0;
                                if (g_handle_timing)
                                    g_t_parse_only += handle_tsc() - pt0;
                                if (batch.ok[i]) {
                                    RecordLite &lite = batch.lites[i];
                                    lite.tid = rname_tid(
                                        std::string_view(
                                            line + lite.rname_start,
                                            lite.rname_len));
                                }
                                }
                                /* consume adjacent boring proper pairs in
                                 * place (the cache-hot fast path for the
                                 * non-chimeric majority); consumed records
                                 * never enter the shard partition */
                                for (size_t i = lo; i + 1 < hi; ++i) {
                                    if (i + 17 < hi && batch.ok[i + 16] == 1) {
                                        const RecordLite &pf =
                                            batch.lites[i + 16];
                                        prefetch_fragment_planes(
                                            shard_sc[s], pf.tid, pf.pos,
                                            pf.end_pos);
                                    }
                                    if (batch.ok[i] != 1 ||
                                        batch.ok[i + 1] != 1)
                                        continue;
                                    uint64_t ct0 = g_handle_timing
                                                       ? handle_tsc() : 0;
                                    /* pairs the lite consume declines
                                     * (viral / non-simple cigars / not
                                     * boring) take the exact handle path
                                     * below — byte-identical by the same
                                     * invariant that covers chunk-boundary
                                     * pairs */
                                    bool consumed_pair =
                                        consume_adjacent_boring_pair_lite(
                                            shard_sc[s], shard_ex[s],
                                            batch.lites[i],
                                            batch.lites[i + 1],
                                            std::string_view(
                                                base + batch.spans[i].first,
                                                batch.lites[i].qname_len),
                                            std::string_view(
                                                base +
                                                    batch.spans[i + 1].first,
                                                batch.lites[i + 1]
                                                    .qname_len));
                                    if (g_handle_timing) {
                                        g_t_consume += handle_tsc() - ct0;
                                        if (consumed_pair) g_n_consumed += 1;
                                    }
                                    if (consumed_pair) {
                                        batch.ok[i] = 2;
                                        batch.ok[i + 1] = 2;
                                        ++i;
                                    }
                                }
                                /* full-parse the survivors (their shard
                                 * key needs the qname either way) */
                                for (size_t i = lo; i < hi; ++i) {
                                    if (batch.ok[i] != 1)
                                        continue;
                                    const char *line =
                                        base + batch.spans[i].first;
                                    size_t len = batch.spans[i].second;
                                    uint64_t ft0 = g_handle_timing
                                                       ? handle_tsc() : 0;
                                    if (!parse_sam_view(
                                            line, len, batch.decoded[i],
                                            !extractor.enabled,
                                            /*lazy_seq=*/extractor
                                                .enabled)) {
                                        batch.ok[i] = 0;
                                        continue;
                                    }
                                    batch.decoded[i].tid =
                                        batch.lites[i].tid;
                                    batch.shard[i] = (uint16_t)(
                                        shard_hash(std::string_view(
                                            line,
                                            batch.decoded[i].qname_len))
                                        % n_shards);
                                    if (g_handle_timing)
                                        g_t_parse_only +=
                                            handle_tsc() - ft0;
                                }
                                /* partition as soon as the LAST tile is
                                 * parsed — whoever parses it does the
                                 * partition; workers that arrive late (the
                                 * main thread after reading the next chunk)
                                 * skip straight to their shard's handle */
                                if (tiles_done.fetch_add(
                                        1, std::memory_order_acq_rel)
                                    + 1 == n_tiles) {
                                    for (auto &list : batch.by_shard)
                                        list.clear();
                                    for (size_t i = 0; i < batch.count; ++i)
                                        if (batch.ok[i] == 1)
                                            batch.by_shard[batch.shard[i]]
                                                .push_back((uint32_t)i);
                                    partitioned.store(
                                        true, std::memory_order_release);
                                }
                            }
                            double w1 = (timing && s == 0) ? now() : 0;
                            while (!partitioned.load(
                                std::memory_order_acquire))
                                std::this_thread::yield();
                            double w2 = (timing && s == 0) ? now() : 0;
                            const std::vector<uint32_t> &mine =
                                batch.by_shard[s];
                            for (size_t k = 0; k < mine.size(); ++k) {
                                if (k + 12 < mine.size()) {
                                    /* shard order hops around the chunk;
                                     * hide the line + Record misses (parse
                                     * ran on another core, so every heap
                                     * block arrives cold) */
                                    uint32_t j = mine[k + 12];
                                    __builtin_prefetch(
                                        base + batch.spans[j].first);
                                    /* the Record spans ~3 cache lines; all
                                     * of it is cold (parsed on another
                                     * core) and the handle path reads most
                                     * fields */
                                    const char *rec =
                                        (const char *)&batch.decoded[j];
                                    __builtin_prefetch(rec);
                                    __builtin_prefetch(rec + 64);
                                    __builtin_prefetch(rec + 128);
                                }
                                if (k + 5 < mine.size()) {
                                    /* the Record itself arrived via the
                                     * k+8 prefetch; now chase its cigar
                                     * heap block */
                                    __builtin_prefetch(
                                        batch.decoded[mine[k + 5]]
                                            .cigar.data());
                                }
                                uint32_t i = mine[k];
                                const char *line = base + batch.spans[i].first;
                                ensure_seq(batch.decoded[i], line);
                                batch.decoded[i].file_pos =
                                    batch.file_base + batch.spans[i].first;
                                handle_record_extract(
                                    shard_sc[s], shard_ex[s], batch.decoded[i],
                                    std::string_view(
                                        line, batch.decoded[i].qname_len));
                            }
                            if (timing && s == 0) {
                                double w3 = now();
                                t_parse0 += w1 - w0;
                                t_barrier0 += w2 - w1;
                                t_handle0 += w3 - w2;
                            }
                        };
                    /* the next chunk reads on its own thread so shard 0
                     * starts with the pool instead of one read-time late;
                     * the reader touches only buffers[1-cur] and the
                     * stream cursor (done/map_pos/chunk_reader), and the
                     * join below orders those writes before the loop test
                     * reads them */
                    std::thread reader;
                    if (!done && n_shards > 1) {
                        double t_read_start = timing ? now() : 0;
                        reader = std::thread([&, t_read_start]() {
                            read_batch(buffers[1 - cur]);
                            if (timing) t_read += now() - t_read_start;
                        });
                    } else if (done) {
                        buffers[1 - cur].count = 0;
                    }
                    for (int s = 1; s < n_shards; ++s)
                        pool.emplace_back(shard_worker, s);
                    shard_worker(0);
                    for (std::thread &worker : pool)
                        worker.join();
                    if (reader.joinable())
                        reader.join();
                    else if (!done && n_shards == 1) {
                        /* single shard: stay genuinely single-threaded */
                        double t_read_start = timing ? now() : 0;
                        read_batch(buffers[1 - cur]);
                        if (timing) t_read += now() - t_read_start;
                    }
                    if (timing) t_pool += now() - t_pool_start;
                    for (size_t i = 0; i < batch.count; ++i) {
                        if (batch.ok[i]) continue;
                        scanner.forwarded.append(
                            batch.src + batch.spans[i].first,
                            batch.spans[i].second);
                        scanner.forwarded += '\n';
                        forwarded_records += 1;
                        scanner.n_records += 1;
                    }
                    cur = 1 - cur;
                }
                if (timing)
                    fprintf(stderr,
                            "sharded scan timing: pool=%.2fs read=%.2fs "
                            "worker0: parse=%.2fs barrier=%.2fs "
                            "handle=%.2fs\n",
                            t_pool, t_read, t_parse0, t_barrier0, t_handle0);
                if (g_handle_timing)
                    fprintf(stderr,
                            "worker0 handle cycles: name=%.2e pend=%.2e "
                            "boring=%.2e cov=%.2e chim=%.2e pairs=%llu "
                            "pend_hit=%llu parse=%.2e consume=%.2e "
                            "consumed=%llu\n",
                            (double)g_t_name, (double)g_t_pend,
                            (double)g_t_boring, (double)g_t_cov,
                            (double)g_t_chim,
                            (unsigned long long)g_n_pairs,
                            (unsigned long long)g_n_pend_hit,
                            (double)g_t_parse_only, (double)g_t_consume,
                            (unsigned long long)g_n_consumed);
                if (chunk_reader.corrupt() && stream_error.empty())
                    stream_error = "corrupt gzip stream in SAM input";
            } else {
            std::vector<std::string> lines(BATCH);
            std::vector<Record> decoded(BATCH);
            std::vector<uint8_t> ok(BATCH);
            bool eof = false;
            while (!eof) {
                size_t count = 0;
                while (count < BATCH) {
                    if (!reader.next_line(lines[count])) { eof = true; break; }
                    if (lines[count].empty())
                        continue;
                    if (lines[count][0] == '@') {
                        header_text += lines[count];
                        header_text += '\n';
                        continue;
                    }
                    count += 1;
                }
                int n_workers = std::min(threads, 8);
                std::vector<std::thread> pool;
                for (int w = 0; w < n_workers; ++w)
                    pool.emplace_back([&, w]() {
                        for (size_t i = w; i < count; i += n_workers) {
                            ok[i] = parse_sam_line(lines[i], decoded[i],
                                                   !extractor.enabled) ? 1 : 0;
                            if (ok[i])
                                decoded[i].tid = resolve_tid(lines[i], 2);
                        }
                    });
                for (std::thread &worker : pool)
                    worker.join();
                for (size_t i = 0; i < count; ++i) {
                    if (!ok[i]) {
                        scanner.forwarded += lines[i];
                        scanner.forwarded += '\n';
                        forwarded_records += 1;
                        scanner.n_records += 1;
                        continue;
                    }
                    size_t name_end = lines[i].find('\t');
                    handle_record(decoded[i], lines[i].substr(0, name_end));
                }
            }
            }
        } else {
            /* optional stage timing (ARRIBA_TPU_SCAN_TIMING=1): read / parse
             * / handle breakdown to stderr for tuning */
            const bool timing = getenv("ARRIBA_TPU_SCAN_TIMING") != nullptr;
            double t_read = 0, t_parse = 0, t_handle = 0;
            auto now = []() {
                struct timespec ts;
                clock_gettime(CLOCK_MONOTONIC, &ts);
                return ts.tv_sec + ts.tv_nsec * 1e-9;
            };
            std::string line;
            Record record;
            for (;;) {
                double t0 = timing ? now() : 0;
                bool more = reader.next_line(line);
                if (timing) t_read += now() - t0;
                if (!more) break;
                if (!line.empty() && line[0] == '@') {
                    header_text += line;
                    header_text += '\n';
                    continue;
                }
                if (line.empty())
                    continue;
                double t1 = timing ? now() : 0;
                bool parsed = parse_sam_line(line, record, !extractor.enabled);
                if (timing) t_parse += now() - t1;
                if (!parsed) {
                    /* malformed: forward so Python reports it consistently */
                    scanner.forwarded += line;
                    scanner.forwarded += '\n';
                    forwarded_records += 1;
                    scanner.n_records += 1;
                    continue;
                }
                record.tid = resolve_tid(line, 2);
                size_t name_end = line.find('\t');
                double t2 = timing ? now() : 0;
                handle_record(record, line.substr(0, name_end));
                if (timing) t_handle += now() - t2;
            }
            if (timing)
                fprintf(stderr, "scan_sam timing: read=%.2fs parse=%.2fs handle=%.2fs\n",
                        t_read, t_parse, t_handle);
        }
        if (reader.corrupt() && stream_error.empty())
            stream_error = "corrupt gzip stream in SAM input";
        gzclose(gz);
    }
    done:

    if (!stream_error.empty()) {
        PyErr_Format(PyExc_IOError, "error reading alignment file '%s': %s",
                     path, stream_error.c_str());
        return nullptr;
    }

    const bool tail_timing = getenv("ARRIBA_TPU_SCAN_TIMING") != nullptr;
    auto tail_now = []() {
        struct timespec ts;
        clock_gettime(CLOCK_MONOTONIC, &ts);
        return ts.tv_sec + ts.tv_nsec * 1e-9;
    };
    double tt0 = tail_timing ? tail_now() : 0, tt_merge = 0, tt_norm = 0,
           tt_sort = 0, tt_end = 0;
    /* drain every worker's residual coverage bins before any plane read */
    bins_flush_all(scanner);
    for (Scanner &shard : shard_sc)
        bins_flush_all(shard);
    if (n_shards > 0) {
        /* fold the shard states back into the master scanner/extractor; the
         * fragment concatenation order is irrelevant because both export
         * paths sort by (unique) fragment name downstream */
        size_t total_fragments = extractor.fragments.size();
        for (int s = 0; s < n_shards; ++s)
            total_fragments += shard_ex[s].fragments.size();
        extractor.fragments.reserve(total_fragments);
        for (int s = 0; s < n_shards; ++s) {
            scanner.n_records += shard_sc[s].n_records;
            scanner.boring_mapped_reads += shard_sc[s].boring_mapped_reads;
            if (private_planes) {
                /* fold the shard's private planes into the master buffers:
                 * wide-sum + clamp == per-increment saturation (all +1),
                 * flags OR */
                for (Py_ssize_t tid = 0; tid < n_tids; ++tid) {
                    CoveragePlane &master = scanner.planes[tid];
                    size_t at = (size_t)s * n_tids + tid;
                    if (master.windows == 0 || priv_cov[at].empty())
                        continue;
                    const uint16_t *cov = priv_cov[at].data();
                    const uint8_t *starts = priv_starts[at].data();
                    const uint8_t *ends = priv_ends[at].data();
                    for (Py_ssize_t w = 0; w < master.windows; ++w) {
                        uint32_t sum = (uint32_t)master.coverage[w] + cov[w];
                        master.coverage[w] =
                            sum > 0xFFFF ? (uint16_t)0xFFFF : (uint16_t)sum;
                        master.starts[w] |= starts[w];
                        master.ends[w] |= ends[w];
                    }
                }
            }
            for (Py_ssize_t tid = 0; tid < n_tids; ++tid)
                scanner.viral_counts[tid] += shard_sc[s].viral_counts[tid];
            extractor.mapped_reads += shard_ex[s].mapped_reads;
            extractor.missing_hi += shard_ex[s].missing_hi;
            extractor.malformed += shard_ex[s].malformed;
            extractor.no_chimeric =
                extractor.no_chimeric && shard_ex[s].no_chimeric;
            for (size_t fi = 0; fi < shard_ex[s].fragments.size(); ++fi) {
                extractor.fragments.push_back(
                    std::move(shard_ex[s].fragments[fi]));
                extractor.fragment_first_pos.push_back(
                    fi < shard_ex[s].fragment_first_pos.size()
                        ? shard_ex[s].fragment_first_pos[fi] : 0);
            }
            shard_ex[s].fragments.clear();
            shard_ex[s].fragment_first_pos.clear();
            shard_ex[s].by_name.clear();
        }
    }

    if (tail_timing) tt_merge = tail_now();

    if (shard_mode == 1) {
        /* worker export: fragments (un-normalized, unsorted — the master
         * normalizes and sorts the merged set once) + every leftover
         * collated record (unpaired within this byte range; pairs split
         * across range boundaries complete in the master replay) */
        std::string frag_blob, leftover_blob;
        serialize_fragments(extractor.fragments,
                            extractor.fragment_first_pos, frag_blob);
        std::string leftover_payload;
        int64_t n_leftovers = 0;
        auto emit_scanner_leftovers = [&](Scanner &sc) {
            if (sc.has_pending) {
                serialize_leftover(sc.pending_name, sc.pending,
                                   leftover_payload);
                n_leftovers += 1;
            }
            const Collator &coll = sc.coll;
            for (size_t slot = 0; slot <= coll.mask && coll.mask; ++slot) {
                if (slot >= coll.index.size() || coll.index[slot] == 0)
                    continue;
                const Collator::Entry &entry =
                    coll.pool[coll.index[slot] - 1];
                serialize_leftover(entry.name, entry.rec, leftover_payload);
                n_leftovers += 1;
            }
        };
        for (Scanner &shard : shard_sc)
            emit_scanner_leftovers(shard);
        emit_scanner_leftovers(scanner);
        put_i64(leftover_blob, n_leftovers);
        leftover_blob += leftover_payload;

        PyObject *worker_viral = PyList_New(n_tids);
        for (Py_ssize_t tid = 0; tid < n_tids; ++tid)
            PyList_SetItem(worker_viral, tid,
                           PyLong_FromLongLong(scanner.viral_counts[tid]));
        PyObject *result = Py_BuildValue(
            "lNl(lli)y#y#",
            extractor.mapped_reads + scanner.boring_mapped_reads,
            worker_viral, scanner.n_records,
            extractor.missing_hi, extractor.malformed,
            extractor.no_chimeric ? 1 : 0,
            frag_blob.data(), (Py_ssize_t)frag_blob.size(),
            leftover_blob.data(), (Py_ssize_t)leftover_blob.size());
        for (Py_buffer &view : buffers)
            PyBuffer_Release(&view);
        return result;
    }

    PyObject *viral_list = PyList_New(n_tids);
    for (Py_ssize_t tid = 0; tid < n_tids; ++tid)
        PyList_SetItem(viral_list, tid, PyLong_FromLongLong(scanner.viral_counts[tid]));

    if (extractor.enabled) {
        /* leftover collated first-mates are dropped, like the Python loop */

        /* remove_malformed_alignments (chimeric.py:392-403) — each
         * fragment normalizes independently; malformed counts sum */
        {
            size_t n_frags = extractor.fragments.size();
            unsigned hw = std::thread::hardware_concurrency();
            size_t W = std::max(1u, std::min({hw ? hw : 1u, 8u,
                                              (unsigned)(n_frags / 16384 + 1)}));
            if (W <= 1) {
                for (FragmentData &fragment : extractor.fragments)
                    if (!normalize_fragment(fragment)) {
                        fragment.dead = true;
                        extractor.malformed += 1;
                    }
            } else {
                std::vector<long> malformed(W, 0);
                std::vector<std::thread> pool;
                for (size_t w = 0; w < W; ++w)
                    pool.emplace_back([&, w]() {
                        for (size_t i = w * n_frags / W;
                             i < (w + 1) * n_frags / W; ++i)
                            if (!normalize_fragment(extractor.fragments[i])) {
                                extractor.fragments[i].dead = true;
                                malformed[w] += 1;
                            }
                    });
                for (std::thread &worker : pool) worker.join();
                for (size_t w = 0; w < W; ++w)
                    extractor.malformed += malformed[w];
            }
        }

        if (tail_timing) tt_norm = tail_now();
        if (extractor.retain) {
            /* retained mode: sort by name (the reference's std::map order),
             * mark multimappers (read_chimeric_alignments.cpp:792-802), and
             * keep the fragments native; Python gets names + counters only */
            extract_store::release_store();
            extract_store::ExtractStore &retained = extract_store::store();
            std::vector<size_t> order;
            order.reserve(extractor.fragments.size());
            for (size_t i = 0; i < extractor.fragments.size(); ++i)
                if (!extractor.fragments[i].dead) order.push_back(i);
            auto by_name = [&](size_t a, size_t b) {
                return extractor.fragments[a].name < extractor.fragments[b].name;
            };
            /* 4-way parallel sort + pairwise merges (same total order) */
            if (order.size() >= 1u << 16 &&
                std::thread::hardware_concurrency() > 1) {
                size_t n = order.size();
                size_t cuts[5] = {0, n / 4, n / 2, 3 * n / 4, n};
                {
                    std::vector<std::thread> pool;
                    for (int p = 0; p < 4; ++p)
                        pool.emplace_back([&, p]() {
                            std::sort(order.begin() + cuts[p],
                                      order.begin() + cuts[p + 1], by_name);
                        });
                    for (std::thread &worker : pool) worker.join();
                }
                std::vector<size_t> merged(n);
                {
                    std::vector<std::thread> pool;
                    pool.emplace_back([&]() {
                        std::merge(order.begin(), order.begin() + cuts[1],
                                   order.begin() + cuts[1],
                                   order.begin() + cuts[2],
                                   merged.begin(), by_name);
                    });
                    pool.emplace_back([&]() {
                        std::merge(order.begin() + cuts[2],
                                   order.begin() + cuts[3],
                                   order.begin() + cuts[3], order.end(),
                                   merged.begin() + cuts[2], by_name);
                    });
                    for (std::thread &worker : pool) worker.join();
                }
                std::merge(merged.begin(), merged.begin() + cuts[2],
                           merged.begin() + cuts[2], merged.end(),
                           order.begin(), by_name);
            } else {
                std::sort(order.begin(), order.end(), by_name);
            }
            if (tail_timing) tt_sort = tail_now();
            retained.fragments.reserve(order.size());
            for (size_t i : order)
                retained.fragments.push_back(std::move(extractor.fragments[i]));

            long multimapper_count = 0;
            auto stripped = [](const std::string &name) {
                size_t comma = name.rfind(',');
                return std::string_view(name.data(),
                                        comma == std::string::npos
                                            ? name.size() : comma);
            };
            for (size_t i = 0; i + 1 < retained.fragments.size(); ++i) {
                if (stripped(retained.fragments[i].name)
                    == stripped(retained.fragments[i + 1].name)) {
                    retained.fragments[i].multimapper = true;
                    retained.fragments[i + 1].multimapper = true;
                    multimapper_count += 1;
                }
            }
            retained.ready = true;

            /* Python fills its name dict via extract_fill_names (always
             * present in this build); the blob fields stay in the tuple
             * shape but empty */
            std::string names_blob;
            std::vector<int64_t> name_offsets(1, 0);
            if (tail_timing) {
                tt_end = tail_now();
                fprintf(stderr,
                        "scan tail timing: merge=%.3fs normalize=%.3fs "
                        "sort=%.3fs store+mark=%.3fs\n",
                        tt_merge - tt0, tt_norm - tt_merge,
                        tt_sort - tt_norm, tt_end - tt_sort);
            }
            PyObject *result = Py_BuildValue(
                "y#lNl(lli)y#y#l",
                header_text.data(), (Py_ssize_t)header_text.size(),
                extractor.mapped_reads + scanner.boring_mapped_reads,
                viral_list,
                scanner.n_records,
                extractor.missing_hi, extractor.malformed,
                extractor.no_chimeric ? 1 : 0,
                names_blob.data(), (Py_ssize_t)names_blob.size(),
                (const char *)name_offsets.data(),
                (Py_ssize_t)(name_offsets.size() * 8),
                multimapper_count);
            for (Py_buffer &view : buffers)
                PyBuffer_Release(&view);
            return result;
        }

        /* serialize fragments to columnar arrays */
        size_t n_frags = 0, n_alignments = 0, names_size = 0, cigar_size = 0,
               seq_size = 0;
        for (const FragmentData &fragment : extractor.fragments) {
            if (fragment.dead) continue;
            n_frags += 1;
            names_size += fragment.name.size();
            n_alignments += fragment.mates.size();
            for (const AlignmentData &mate : fragment.mates) {
                cigar_size += mate.cigar.size();
                seq_size += mate.seq.size();
            }
        }
        std::string names_blob; names_blob.reserve(names_size);
        std::vector<int64_t> name_offsets(n_frags + 1, 0);
        std::vector<int64_t> frag_offsets(n_frags + 1, 0);
        std::vector<int64_t> frag_flags(n_frags, 0);
        std::vector<int64_t> aln_contig(n_alignments), aln_start(n_alignments),
            aln_end(n_alignments), aln_flags(n_alignments);
        std::vector<int64_t> cigar_offsets(n_alignments + 1, 0);
        std::vector<uint32_t> cigar_words; cigar_words.reserve(cigar_size);
        std::vector<int64_t> seq_offsets(n_alignments + 1, 0);
        std::string seq_blob; seq_blob.reserve(seq_size);
        size_t f = 0, row = 0;
        for (const FragmentData &fragment : extractor.fragments) {
            if (fragment.dead) continue;
            names_blob += fragment.name;
            name_offsets[f + 1] = (int64_t)names_blob.size();
            frag_flags[f] = (fragment.single_end ? 1 : 0) | (fragment.duplicate ? 2 : 0);
            for (const AlignmentData &mate : fragment.mates) {
                aln_contig[row] = mate.contig;
                aln_start[row] = mate.start;
                aln_end[row] = mate.end;
                aln_flags[row] = (mate.supplementary ? 1 : 0) |
                                 (mate.first_in_pair ? 2 : 0) |
                                 (mate.strand ? 4 : 0);
                cigar_words.insert(cigar_words.end(), mate.cigar.begin(), mate.cigar.end());
                cigar_offsets[row + 1] = (int64_t)cigar_words.size();
                seq_blob += mate.seq;
                seq_offsets[row + 1] = (int64_t)seq_blob.size();
                row += 1;
            }
            frag_offsets[f + 1] = (int64_t)row;
            f += 1;
        }

        PyObject *result = Py_BuildValue(
            "y#lNl(lli)(y#y#y#y#y#y#y#y#y#y#)",
            header_text.data(), (Py_ssize_t)header_text.size(),
            extractor.mapped_reads + scanner.boring_mapped_reads,
            viral_list,
            scanner.n_records,
            extractor.missing_hi, extractor.malformed,
            extractor.no_chimeric ? 1 : 0,
            names_blob.data(), (Py_ssize_t)names_blob.size(),
            (const char *)name_offsets.data(), (Py_ssize_t)(name_offsets.size() * 8),
            (const char *)frag_offsets.data(), (Py_ssize_t)(frag_offsets.size() * 8),
            (const char *)frag_flags.data(), (Py_ssize_t)(frag_flags.size() * 8),
            (const char *)aln_contig.data(), (Py_ssize_t)(aln_contig.size() * 8),
            (const char *)aln_start.data(), (Py_ssize_t)(aln_start.size() * 8),
            (const char *)aln_end.data(), (Py_ssize_t)(aln_end.size() * 8),
            (const char *)aln_flags.data(), (Py_ssize_t)(aln_flags.size() * 8),
            (const char *)cigar_offsets.data(), (Py_ssize_t)(cigar_offsets.size() * 8),
            (const char *)cigar_words.data(), (Py_ssize_t)(cigar_words.size() * 4));
        /* seq arrays appended separately (Py_BuildValue arg count limits) */
        PyObject *seq_tuple = Py_BuildValue(
            "(y#y#)",
            (const char *)seq_offsets.data(), (Py_ssize_t)(seq_offsets.size() * 8),
            seq_blob.data(), (Py_ssize_t)seq_blob.size());
        for (Py_buffer &view : buffers)
            PyBuffer_Release(&view);
        if (result == nullptr || seq_tuple == nullptr) {
            Py_XDECREF(result); Py_XDECREF(seq_tuple);
            return nullptr;
        }
        PyObject *combined = PyTuple_New(2);
        PyTuple_SET_ITEM(combined, 0, result);
        PyTuple_SET_ITEM(combined, 1, seq_tuple);
        return combined;
    }

    /* unpaired leftovers: forward (Python's collator will hold them too) */
    for (auto &entry : scanner.collated) {
        scanner.forwarded += line_of(entry.second);
        scanner.forwarded += '\n';
        forwarded_records += 1;
    }

    PyObject *result = Py_BuildValue(
        "y#y#lNl",
        header_text.data(), (Py_ssize_t)header_text.size(),
        scanner.forwarded.data(), (Py_ssize_t)scanner.forwarded.size(),
        scanner.boring_mapped_reads,
        viral_list,
        scanner.n_records);

    for (Py_buffer &view : buffers)
        PyBuffer_Release(&view);
    return result;
}

/* Brute-force ITD window scan: the inner loop of is_tandem_duplication
 * (read_chimeric_alignments.cpp:215-336). Returns (contig_pos, aln_start,
 * aln_end) of the first accepted window position, or None. */
/* bgzf_inflate_selftest(n_trials, seed): differential test of the fast
 * DEFLATE decoder (native/inflate.h) against zlib-compressed random data
 * at every level/strategy; returns the number of failures (0 = pass). */
static PyObject *bgzf_inflate_selftest(PyObject *, PyObject *args) {
    long long n_trials = 200, seed = 1234;
    if (!PyArg_ParseTuple(args, "|LL", &n_trials, &seed))
        return nullptr;
    std::mt19937 rng((uint32_t)seed);
    long long fails = 0;
    std::vector<uint8_t> data, comp, out;
    for (long long trial = 0; trial < n_trials; ++trial) {
        size_t n = 1 + rng() % 65536;
        data.resize(n);
        int mode = (int)(trial % 5);
        for (size_t i = 0; i < n; ++i) {
            if (mode == 0) data[i] = (uint8_t)rng();
            else if (mode == 1) data[i] = (uint8_t)"ACGT"[rng() & 3];
            else if (mode == 2) data[i] = (uint8_t)(i & 7);
            else if (mode == 3)
                data[i] = i > 100 ? data[i - (1 + rng() % 90)]
                                  : (uint8_t)rng();
            else data[i] = 'A';
        }
        uLongf cap = compressBound((uLong)n);
        comp.assign(cap, 0);
        z_stream ds{};
        deflateInit2(&ds, 1 + (int)(trial % 9), Z_DEFLATED, -15, 8,
                     trial % 3 == 0 ? Z_FILTERED : Z_DEFAULT_STRATEGY);
        ds.next_in = data.data();
        ds.avail_in = (uInt)n;
        ds.next_out = comp.data();
        ds.avail_out = cap;
        deflate(&ds, Z_FINISH);
        size_t comp_n = cap - ds.avail_out;
        deflateEnd(&ds);
        comp.resize(comp_n + 8, 0);
        out.assign(n + 32, 0);
        bool ok = fast_inflate::decompress(comp.data(), comp_n, comp_n + 8,
                                           out.data(), n);
        if (!ok || memcmp(out.data(), data.data(), n) != 0)
            fails += 1;
    }
    return PyLong_FromLongLong(fails);
}

static PyObject *tandem_scan(PyObject *, PyObject *args) {
    const char *clipped;
    Py_ssize_t clipped_len;
    Py_buffer contig;
    long long window_start, window_end;
    int direction;
    if (!PyArg_ParseTuple(args, "y#y*LLi", &clipped, &clipped_len, &contig,
                          &window_start, &window_end, &direction))
        return nullptr;
    const uint8_t *contig_seq = (const uint8_t *)contig.buf;
    const long long contig_len = contig.len;
    const int max_non_template_bases = 6, max_mismatches = 1,
              min_alignment_length = 15;

    for (long long contig_pos = window_start; contig_pos <= window_end; ++contig_pos) {
        if (contig_pos < 0 || contig_pos + clipped_len > contig_len)
            continue;
        const uint8_t *window = contig_seq + contig_pos;
        long long matches = 0, mismatches = 0;
        long long aln_start = contig_len, aln_end = -1;
        for (Py_ssize_t i = 0; i < clipped_len; ++i) {
            Py_ssize_t read_pos = (direction == 1) ? i : clipped_len - 1 - i;
            if (window[read_pos] == (uint8_t)clipped[read_pos]) {
                matches += 1;
                if (contig_pos + read_pos < aln_start) aln_start = contig_pos + read_pos;
                if (contig_pos + read_pos > aln_end) aln_end = contig_pos + read_pos;
            } else if (i >= max_non_template_bases) {
                mismatches += 1;
                if (mismatches > max_mismatches)
                    break;
            }
        }
        if (matches >= min_alignment_length || matches + mismatches == clipped_len) {
            PyBuffer_Release(&contig);
            return Py_BuildValue("LLL", contig_pos, aln_start, aln_end);
        }
    }
    PyBuffer_Release(&contig);
    Py_RETURN_NONE;
}

extern PyObject *realign_reset(PyObject *, PyObject *);
extern PyObject *realign_set_contig(PyObject *, PyObject *);
extern PyObject *realign_add_kmers(PyObject *, PyObject *);
extern PyObject *realign_finalize(PyObject *, PyObject *);
extern PyObject *realign_set_splice_sites(PyObject *, PyObject *);
extern PyObject *realign_align(PyObject *, PyObject *);
extern PyObject *realign_is_homolog(PyObject *, PyObject *);
extern PyObject *low_entropy_scan(PyObject *, PyObject *);
extern PyObject *annotate_bind(PyObject *, PyObject *);
extern PyObject *annotate_bulk(PyObject *, PyObject *);
extern PyObject *mismatch_scan(PyObject *, PyObject *);
extern PyObject *low_entropy_scan_flat(PyObject *, PyObject *);
extern PyObject *cascade_begin(PyObject *, PyObject *);
extern PyObject *cascade_finish(PyObject *, PyObject *);
extern PyObject *cascade_low_entropy_rows(PyObject *, PyObject *);
extern PyObject *cascade_set_filters(PyObject *, PyObject *);
extern PyObject *find_fusions_native(PyObject *, PyObject *);
extern PyObject *cascade_release(PyObject *, PyObject *);
extern PyObject *event_bind(PyObject *, PyObject *);
extern PyObject *event_export(PyObject *, PyObject *);
extern PyObject *gtf_parse(PyObject *, PyObject *);
extern PyObject *fasta_bodies(PyObject *, PyObject *);
extern PyObject *event_release(PyObject *, PyObject *);
extern PyObject *ev_merge_adjacent(PyObject *, PyObject *);
extern PyObject *ev_multimappers(PyObject *, PyObject *);
extern PyObject *ev_estimate_expected(PyObject *, PyObject *);
extern PyObject *ev_non_coding_neighbors(PyObject *, PyObject *);
extern PyObject *ev_intragenic_exonic(PyObject *, PyObject *);
extern PyObject *ev_min_support(PyObject *, PyObject *);
extern PyObject *ev_relative_support(PyObject *, PyObject *);
extern PyObject *ev_recover_itd(PyObject *, PyObject *);
extern PyObject *ev_both_intronic(PyObject *, PyObject *);
extern PyObject *ev_in_vitro(PyObject *, PyObject *);
extern PyObject *ev_recover_both_spliced(PyObject *, PyObject *);
extern PyObject *ev_select_best(PyObject *, PyObject *);
extern PyObject *ev_marginal_read_through(PyObject *, PyObject *);
extern PyObject *ev_recover_many_spliced(PyObject *, PyObject *);
extern PyObject *ev_assign_confidence(PyObject *, PyObject *);
extern PyObject *ev_no_genomic_support(PyObject *, PyObject *);
extern PyObject *ev_recover_genomic_support(PyObject *, PyObject *);
extern PyObject *ev_short_anchor(PyObject *, PyObject *);
extern PyObject *ev_end_to_end(PyObject *, PyObject *);
extern PyObject *ev_no_coverage(PyObject *, PyObject *);
extern PyObject *ev_recover_isoforms(PyObject *, PyObject *);
extern PyObject *ev_blacklist(PyObject *, PyObject *);
extern PyObject *ev_known_fusions(PyObject *, PyObject *);
extern PyObject *ev_make_kmer_index(PyObject *, PyObject *);
extern PyObject *ev_homologs(PyObject *, PyObject *);
extern PyObject *ev_mismappers(PyObject *, PyObject *);
extern PyObject *ev_write_discarded(PyObject *, PyObject *);
extern PyObject *ev_map_order(PyObject *, PyObject *);
extern PyObject *ev_stdmap_probe(PyObject *, PyObject *);
extern PyObject *cascade_begin_retained(PyObject *, PyObject *);
extern PyObject *gene_index_bind(PyObject *, PyObject *);
extern PyObject *detect_strandedness_native(PyObject *, PyObject *);
extern PyObject *assign_strands_native(PyObject *, PyObject *);
extern PyObject *annotate_store_phase1(PyObject *, PyObject *);
extern PyObject *annotate_store_phase2(PyObject *, PyObject *);
extern PyObject *extract_export_fragment(PyObject *, PyObject *);
extern PyObject *extract_fill_names(PyObject *, PyObject *);
extern PyObject *extract_export_all(PyObject *, PyObject *);
extern PyObject *extract_cluster_ids(PyObject *, PyObject *);
extern PyObject *extract_release(PyObject *, PyObject *);
extern PyObject *extract_fragment_filters(PyObject *, PyObject *);
extern PyObject *extract_supporting_reads(PyObject *, PyObject *);
extern PyObject *ev_transcript_pileups(PyObject *, PyObject *);
extern PyObject *ev_transcript_consensus(PyObject *, PyObject *);
extern PyObject *ev_transcript_consensus_batch(PyObject *, PyObject *);
extern PyObject *ev_bind_transcript_tables(PyObject *, PyObject *);
extern PyObject *ev_get_transcripts(PyObject *, PyObject *);

static PyMethodDef methods[] = {
    {"realign_reset", realign_reset, METH_NOARGS,
     "Clear the realignment engine (contigs, k-mer indices, splice sites)."},
    {"realign_set_contig", realign_set_contig, METH_VARARGS,
     "Register a contig sequence buffer with the realignment engine."},
    {"realign_add_kmers", realign_add_kmers, METH_VARARGS,
     "Index 8-mers of a contig region into the engine."},
    {"realign_finalize", realign_finalize, METH_NOARGS,
     "Sort and deduplicate the engine's k-mer position lists."},
    {"realign_set_splice_sites", realign_set_splice_sites, METH_VARARGS,
     "Register a gene's sorted downstream splice sites (int64 bytes)."},
    {"realign_align", realign_align, METH_VARARGS,
     "Exact recursive seed-and-extend alignment of a read against a gene window."},
    {"realign_is_homolog", realign_is_homolog, METH_VARARGS,
     "8+8-mer homology test of a small gene sequence inside a big gene window."},
    {"low_entropy_scan", low_entropy_scan, METH_VARARGS,
     "Batched recurrent-k-mer (low-entropy) scan with the reference's early exit."},
    {"annotate_bind", annotate_bind, METH_VARARGS,
     "Register the exon interval index and exon/gene tables for annotation."},
    {"annotate_bulk", annotate_bulk, METH_VARARGS,
     "Annotate all fragments (gene sets, strands, exonic flags) in one call."},
    {"mismatch_scan", mismatch_scan, METH_VARARGS,
     "Bulk (mismatches, alignment_length) computation for candidate alignments."},
    {"low_entropy_scan_flat", low_entropy_scan_flat, METH_VARARGS,
     "Low-entropy scan over concatenated raw sequences (CSR, no padding)."},
    {"cascade_begin", cascade_begin, METH_VARARGS,
     "Read-level cascade stages 1-5 + fragment-length gap collection."},
    {"cascade_low_entropy_rows", cascade_low_entropy_rows, METH_VARARGS,
     "export stage-13 rows for device offload"},
    {"cascade_set_filters", cascade_set_filters, METH_VARARGS,
     "apply device stage verdicts to fragment rows"},
    {"cascade_finish", cascade_finish, METH_VARARGS,
     "Read-level cascade stages 6-14; returns per-fragment filter ids."},
    {"find_fusions_native", find_fusions_native, METH_VARARGS,
     "Candidate generation + discordant assignment + strand prediction over "
     "the cascade's fragment store."},
    {"cascade_release", cascade_release, METH_NOARGS,
     "Release the cascade fragment store and its pinned buffers."},
    {"event_bind", event_bind, METH_VARARGS,
     "Bind event-cascade context (gene props, gene index, coverage bitmaps)."},
    {"fasta_bodies", fasta_bodies, METH_VARARGS,
     "uppercase+newline-strip FASTA record bodies (threaded)"},
    {"gtf_parse", gtf_parse, METH_VARARGS,
     "parse a GTF gene model into columnar annotation tables"},
    {"event_export", event_export, METH_VARARGS,
     "Serialize the fusion table + per-fragment filters for materialization."},
    {"event_release", event_release, METH_NOARGS,
     "Release the event fusion store and the cascade fragment store."},
    {"ev_merge_adjacent", ev_merge_adjacent, METH_VARARGS,
     "Event stage: merge adjacent fusion breakpoints (merge_adjacent_fusions.cpp)."},
    {"ev_multimappers", ev_multimappers, METH_NOARGS,
     "Event stage: discard all but the best multi-mapping alignment "
     "(filter_multimappers.cpp)."},
    {"ev_estimate_expected", ev_estimate_expected, METH_VARARGS,
     "Event stage: e-value model (filter_relative_support.cpp:17-207)."},
    {"ev_non_coding_neighbors", ev_non_coding_neighbors, METH_NOARGS,
     "Event stage: filter read-through between non-coding neighbors."},
    {"ev_intragenic_exonic", ev_intragenic_exonic, METH_VARARGS,
     "Event stage: filter intragenic both-exonic events."},
    {"ev_min_support", ev_min_support, METH_VARARGS,
     "Event stage: minimum supporting-read filter."},
    {"ev_relative_support", ev_relative_support, METH_VARARGS,
     "Event stage: e-value cutoff filter (filter_relative_support.cpp:209-224)."},
    {"ev_recover_itd", ev_recover_itd, METH_VARARGS,
     "Event stage: recover internal tandem duplications."},
    {"ev_both_intronic", ev_both_intronic, METH_VARARGS,
     "Event stage: filter fusions with only intronic/intergenic reads."},
    {"ev_in_vitro", ev_in_vitro, METH_VARARGS,
     "Event stage: filter in vitro-generated artifacts (filter_in_vitro.cpp)."},
    {"ev_recover_both_spliced", ev_recover_both_spliced, METH_VARARGS,
     "Event stage: recover fusions with spliced split reads."},
    {"ev_select_best", ev_select_best, METH_NOARGS,
     "Event stage: keep one breakpoint pair per gene pair (select_best.cpp)."},
    {"ev_marginal_read_through", ev_marginal_read_through, METH_NOARGS,
     "Event stage: filter read-through near the gene boundary."},
    {"ev_recover_many_spliced", ev_recover_many_spliced, METH_VARARGS,
     "Event stage: recover gene pairs with many spliced events."},
    {"ev_assign_confidence", ev_assign_confidence, METH_NOARGS,
     "Event stage: assign confidence scores (filter_genomic_support.cpp:222)."},
    {"ev_no_genomic_support", ev_no_genomic_support, METH_VARARGS,
     "Event stage: filter low-confidence events without WGS support."},
    {"ev_recover_genomic_support", ev_recover_genomic_support, METH_NOARGS,
     "Event stage: recover events with WGS support."},
    {"ev_short_anchor", ev_short_anchor, METH_VARARGS,
     "Event stage: filter fusions with short anchors."},
    {"ev_end_to_end", ev_end_to_end, METH_VARARGS,
     "Event stage: filter end-to-end fusions with low support."},
    {"ev_no_coverage", ev_no_coverage, METH_NOARGS,
     "Event stage: filter fusions with no coverage around the breakpoints."},
    {"ev_recover_isoforms", ev_recover_isoforms, METH_NOARGS,
     "Event stage: recover additional isoforms of called fusions."},
    {"ev_blacklist", ev_blacklist, METH_VARARGS,
     "Event stage: blacklist matching over pre-parsed item pairs."},
    {"ev_known_fusions", ev_known_fusions, METH_VARARGS,
     "Event stage: known-fusions recovery over pre-parsed item pairs."},
    {"ev_make_kmer_index", ev_make_kmer_index, METH_VARARGS,
     "Event stage: index fusion-gene k-mers into the realignment engine."},
    {"ev_homologs", ev_homologs, METH_VARARGS,
     "Event stage: filter fusions between homologous genes."},
    {"ev_mismappers", ev_mismappers, METH_VARARGS,
     "Event stage: re-align chimeric reads to filter mis-mappers."},
    {"ev_write_discarded", ev_write_discarded, METH_VARARGS,
     "Serialize the discarded-fusions TSV natively from the fusion table."},
    {"ev_map_order", ev_map_order, METH_NOARGS,
     "Fusion indices in the reference unordered_map iteration order."},
    {"ev_stdmap_probe", ev_stdmap_probe, METH_VARARGS,
     "Iteration order of an unordered_map with the given key hashes."},
    {"cascade_begin_retained", cascade_begin_retained, METH_VARARGS,
     "Read-level cascade stages 1-5 over the retained extraction store."},
    {"gene_index_bind", gene_index_bind, METH_VARARGS,
     "Register the gene interval index + gene tables with the annotation "
     "engine (for the retained-store annotation chain)."},
    {"detect_strandedness_native", detect_strandedness_native, METH_NOARGS,
     "Detect strandedness over the retained store (read_stats.cpp:94-143)."},
    {"assign_strands_native", assign_strands_native, METH_VARARGS,
     "Assign predicted strands from strandedness over the retained store."},
    {"annotate_store_phase1", annotate_store_phase1, METH_VARARGS,
     "Exon + gene-fallback annotation of the retained store; returns dummy "
     "gene ranges."},
    {"annotate_store_phase2", annotate_store_phase2, METH_NOARGS,
     "Re-annotate unmapped alignments and disambiguate dummy genes."},
    {"extract_fill_names", extract_fill_names, METH_VARARGS,
     "Fill {name: None} and {name: row} dicts from the retained store"},
    {"extract_export_fragment", extract_export_fragment, METH_VARARGS,
     "Lazily export one retained fragment for Python materialization."},
    {"extract_export_all", extract_export_all, METH_NOARGS,
     "Bulk columnar export of the retained extraction store."},
    {"extract_cluster_ids", extract_cluster_ids, METH_NOARGS,
     "Multimapper cluster ids over the retained (sorted) fragment store."},
    {"extract_release", extract_release, METH_NOARGS,
     "Release the retained extraction store."},
    {"extract_fragment_filters", extract_fragment_filters, METH_NOARGS,
     "Per-fragment filter ids of the retained store as int64 bytes."},
    {"extract_supporting_reads", extract_supporting_reads, METH_VARARGS,
     "Joined stripped read names + filter histogram for given indices."},
    {"ev_transcript_consensus_batch", ev_transcript_consensus_batch,
     METH_VARARGS,
     "Batched ev_transcript_consensus over a list of fusions (thread pool)."},
    {"ev_transcript_consensus", ev_transcript_consensus, METH_VARARGS,
     "pileups + both consensus sequences over the native store"},
    {"ev_bind_transcript_tables", ev_bind_transcript_tables, METH_VARARGS,
     "Bind exon->transcript and transcript first/last/coding tables."},
    {"ev_get_transcripts", ev_get_transcripts, METH_VARARGS,
     "Best-transcript selection over the fusion transcript (native)."},
    {"ev_transcript_pileups", ev_transcript_pileups, METH_VARARGS,
     "Fusion-transcript pileups + non-template bases over the native store."},
    {"coverage_bind", coverage_bind, METH_VARARGS,
     "Bind per-contig coverage arrays so coverage_add can update them."},
    {"coverage_add", coverage_add, METH_VARARGS,
     "Run the dual-CIGAR coverage walk for one fragment natively."},
    {"bgzf_inflate_selftest", bgzf_inflate_selftest, METH_VARARGS,
     "differential-test the fast DEFLATE decoder against zlib"},
    {"tandem_scan", tandem_scan, METH_VARARGS,
     "ITD brute-force window scan; returns (contig_pos, aln_start, aln_end) or None."},
    {"scan_sam", scan_sam, METH_VARARGS,
     "Scan a SAM/SAM.gz file: decode, collate, handle boring pairs natively, "
     "forward the rest as SAM text."},
    {"codec_rans4x8", codec_rans4x8, METH_VARARGS,
     "Decode one rANS 4x8 block payload (CRAM 3.0 method 4)."},
    {"codec_rans4x16", codec_rans4x16, METH_VARARGS,
     "Decode one rANS Nx16 container (CRAM 3.1 method 5; optional out_len)."},
    {"scan_open", scan_open, METH_VARARGS,
     "Open an alignment stream (works on pipes), consume its header, return "
     "(kind, header_text, target_names, target_lengths); scan_sam(resume=1) "
     "continues from the open stream."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_native",
    "Native data loader for arriba_tpu", -1, methods,
};

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&module); }
