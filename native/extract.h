// Retained native extraction store: scan_sam (ingest.cpp) keeps the
// extracted chimeric fragments here (sorted by read name, multimapper
// flags set) so the annotation chain (annotate.cpp) and the read-level
// cascade (cascade.cpp) consume them in place — no Python materialization
// or re-marshal round trips. Python sees only the read names plus a lazy
// per-fragment export for the output writer.
#pragma once

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <string>
#include <vector>

namespace extract_store {

struct ExtractMate {
    bool supplementary = false, first_in_pair = false;
    bool strand = true;  // FORWARD
    bool predicted_strand = true;
    bool predicted_strand_ambiguous = true;
    bool exonic = false;
    int64_t contig = 0, start = 0, end = 0;
    std::vector<uint32_t> cigar;
    std::string seq;
    std::vector<int64_t> genes;

    int64_t preclipping() const {
        if (!cigar.empty()) {
            uint32_t op = cigar.front() & 0xf;
            if (op == 4 || op == 5) return cigar.front() >> 4;  // S/H
        }
        return 0;
    }
    int64_t postclipping() const {
        if (!cigar.empty()) {
            uint32_t op = cigar.back() & 0xf;
            if (op == 4 || op == 5) return cigar.back() >> 4;
        }
        return 0;
    }
};

struct ExtractFragment {
    std::string name;
    bool single_end = false, duplicate = false, multimapper = false;
    bool dead = false;
    std::vector<ExtractMate> mates;
};

struct ExtractStore {
    std::vector<ExtractFragment> fragments;  // sorted by name
    bool ready = false;
};

ExtractStore &store();
void release_store();

}  // namespace extract_store
