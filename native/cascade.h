// Shared view of the read-level cascade's fragment store for native stages
// that run after it (find_fusions). cascade.cpp owns and populates the data.
#pragma once
#include <atomic>

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <string>
#include <vector>

namespace cascade_store {

struct Mate {
    int64_t contig = 0, start = 0, end = 0;
    bool strand = true;  // FORWARD
    bool predicted_strand = true;
    bool predicted_strand_ambiguous = true;
    bool exonic = false;
    const uint32_t *cigar = nullptr;
    int64_t n_cigar = 0;
    const char *seq = nullptr;
    int64_t seq_len = 0;
    const int64_t *genes = nullptr;
    int64_t n_genes = 0;

    int64_t preclipping() const {
        if (n_cigar) {
            uint32_t op = cigar[0] & 0xf;
            if (op == 4 || op == 5) return cigar[0] >> 4;  // S/H
        }
        return 0;
    }
    int64_t postclipping() const {
        if (n_cigar) {
            uint32_t op = cigar[n_cigar - 1] & 0xf;
            if (op == 4 || op == 5) return cigar[n_cigar - 1] >> 4;
        }
        return 0;
    }
};

struct Fragment {
    int64_t filter = 0;
    bool single_end = false, duplicate = false, multimapper = false;
    int n_mates = 0;
    Mate mates[3];
};

struct Params {
    bool external_duplicate_marking = false;
    int64_t top_viral_contigs = 0;
    double viral_min_covered_fraction = 0;
    int64_t min_read_through_distance = 0;
    int64_t homopolymer_length = 0;
    uint32_t enabled = 0;                 // bit per stage, cascade order
    int64_t filter_ids[14] = {0};
};

struct Cascade {
    // nonzero while a GIL-released worker pool is reading the store
    // (event.cpp batch consensus); teardown/rebind must refuse then
    std::atomic<int> busy{0};
    std::vector<Fragment> fragments;
    // backing stores
    std::vector<uint32_t> cigars;
    std::string seqs;
    std::vector<int64_t> genes_items;

    std::vector<uint8_t> interesting, viral;       // per contig
    std::vector<int64_t> mapped_viral;             // per contig
    std::vector<int64_t> gene_start, gene_end;
    std::vector<uint8_t> gene_is_dummy;
    std::vector<const uint8_t *> assembly;
    std::vector<int64_t> assembly_len;
    std::vector<const uint16_t *> coverage;
    std::vector<int64_t> coverage_len;
    std::vector<Py_buffer> held;

    Params params;
    bool ready = false;
};

Cascade &cascade();
void release_cascade();

// annotation.cpp:570-618 via the annotation engine (defined in cascade.cpp)
int64_t spliced_distance(int64_t contig, int64_t position1, int64_t position2,
                         int64_t gene);

}  // namespace cascade_store
