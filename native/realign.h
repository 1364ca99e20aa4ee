// Shared view of the realignment engine (contig k-mer indices + per-gene
// splice sites) so the native event stages (event.cpp) can drive the exact
// recursive aligner of filter_mismappers.cpp without the Python round-trip.
// realign.cpp owns the data.
#pragma once

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <unordered_map>
#include <vector>

namespace realign_engine {

constexpr int REALIGN_KMER_LENGTH = 8;

/* k-mer index position type: contig positions fit int32 (the reference's
 * own position_t is int, annotation.hpp); halving the entry width halves
 * the index's build and probe memory traffic */
typedef int32_t kpos_t;
typedef std::pair<uint32_t, kpos_t> KmerPair;

struct Contig {
    PyObject *owner = nullptr; /* keeps the buffer alive (null for raw) */
    Py_buffer view{};          /* ACTIVE export pinning the memory: an owner
                                  reference alone does not stop a bytearray
                                  (or any resizable exporter) from moving
                                  its storage */
    bool view_held = false;
    const uint8_t *data = nullptr;
    Py_ssize_t length = 0;
    /* CSR k-mer index over the 2-bit 8-mer space (65536 buckets): built by
     * appending (kmer, position) pairs to `pending`, finalized into
     * offsets/positions with per-bucket sort+unique */
    std::vector<KmerPair> pending;
    std::vector<int64_t> kmer_offsets;    /* 65537 entries when built */
    std::vector<kpos_t> kmer_positions;
};

constexpr uint32_t KMER_BUCKETS = 1u << (2 * REALIGN_KMER_LENGTH);

void finalize_kmer_index(Contig &contig);

/* multithreaded finalize consuming extra per-worker span buffers in place
 * (no merge copy); byte-identical to finalize_kmer_index for any span
 * order, partition, or thread count */
void finalize_kmer_index_spans(
    Contig &contig,
    const std::vector<const std::vector<KmerPair>*> &extra,
    int threads);

struct Engine {
    std::unordered_map<int, Contig> contigs;
    std::unordered_map<long, std::vector<int64_t>> splice_sites; /* per gene */
    /* per-gene 8-mer presence bitset over the gene's PADDED window on its
     * contig (65536 bits = 8 KB): one L1/L2 bit probe rejects ~90% of the
     * outer-loop seed lookups in align_recursive before the hash-bucket
     * binary search. Built from the raw contig bytes over [start, end), so
     * it is a SUPERSET of every position the bucket could return for any
     * query range INSIDE [start, end) (overlapping neighbour windows
     * included) — absent bit => no hit, guaranteed. Callers must verify
     * their query range is covered and pass nullptr otherwise. */
    struct GeneBits {
        int64_t start = 0, end = 0;
        std::vector<uint64_t> bits;
    };
    std::unordered_map<long, GeneBits> gene_kmer_bits;
};

Engine &engine();

uint32_t kmer_at(const uint8_t *sequence, Py_ssize_t position);

/* set presence bits for every 8-mer of data[start..end] into bits
 * (KMER_BUCKETS / 64 u64 words) */
void fill_kmer_bits(const uint8_t *data, int64_t start, int64_t end,
                    std::vector<uint64_t> &bits);

/* append (kmer, pos) for every pos in [start, end) with pos + K < end and
 * data[pos] != 'N', using a rolling 2-bit window (one base decode per
 * position instead of K) — identical pairs to the kmer_at loop */
void append_window_kmers(const uint8_t *data, int64_t start, int64_t end,
                         std::vector<KmerPair> &out);

// filter_mismappers.cpp:86-187
bool align_recursive(int score, const uint8_t *read, Py_ssize_t read_length,
                     Py_ssize_t read_pos, const Contig &contig,
                     int64_t gene_pos, int64_t gene_start, int64_t gene_end,
                     const std::vector<int64_t> &splice_sites, int min_score,
                     int max_deletions,
                     const uint64_t *kmer_bits = nullptr);

// filter_homologs.cpp:13-63 core (the caller prepares small_seq, possibly
// reverse-complemented)
bool is_homolog_core(const uint8_t *small_seq, Py_ssize_t small_size,
                     int small_contig, int64_t small_start, int64_t small_end,
                     int big_contig, int64_t big_start, int64_t big_end,
                     int64_t small_length, double max_identity_fraction);

// Register a contig from a raw borrowed pointer (the cascade store pins the
// underlying buffers for the run's lifetime).
void set_contig_raw(int cid, const uint8_t *data, Py_ssize_t length);

void reset_engine();

}  // namespace realign_engine
