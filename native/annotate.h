// Shared view of the annotation engine (exon interval index + exon/gene
// tables) for native stages that need splice-site tests and spliced
// distances (annotate.cpp owns the data; cascade.cpp consumes it).
#pragma once

#include <cstdint>
#include <vector>

namespace annotate_engine {

struct ContigIndex {
    std::vector<int64_t> boundaries;  // sorted unique region keys
    std::vector<int64_t> offsets;     // CSR offsets, len = n_boundaries + 1
    std::vector<int64_t> items;       // feature rows per region, ascending
};

struct Engine {
    int n_contigs = 0;
    std::vector<ContigIndex> exon_index;
    std::vector<int64_t> exon_gene, exon_start, exon_end, exon_prev, exon_next,
        exon_cds_start, exon_cds_end;
    std::vector<int64_t> gene_contig, gene_strand;
    bool ready = false;

    // gene interval index + tables (gene_index_bind) for the retained-store
    // annotation chain and native strandedness detection
    std::vector<ContigIndex> gene_index;
    std::vector<int64_t> gene_start, gene_end;
    std::vector<uint8_t> gene_is_dummy;
    bool gene_index_ready = false;

    // transcript tables (ev_bind_transcript_tables) for the native
    // best-transcript selection (output_fusions.cpp:711-818)
    std::vector<int64_t> exon_transcript, transcript_first_exon,
        transcript_last_exon, transcript_coding_length;
    bool transcript_tables_ready = false;
};

Engine &engine();

// annotation.cpp:404-429
bool is_breakpoint_spliced(int64_t gene, bool direction, int64_t breakpoint);

// annotation.t.hpp:61-68 / :70-99 over the engine's exon index (for native
// event stages that need exon lookups)
void exon_point_query(int64_t contig, int64_t pos, std::vector<int64_t> &out);
void exon_range_query(int64_t contig, int64_t start, int64_t end,
                      std::vector<int64_t> &out);

}  // namespace annotate_engine
