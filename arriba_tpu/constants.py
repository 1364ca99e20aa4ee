"""Core constants and the filter registry.

Reference parity: source/common.hpp:21-68 (FILTERS registry, strand and
direction types). Filter ids are sequential small integers so that per-read /
per-fusion filter state packs into a uint8 array — the masked-semantics design
the whole cascade relies on (nothing is deleted, everything is labeled).
"""

from __future__ import annotations

# --- strands (common.hpp:21-23) ---------------------------------------------
FORWARD = True
REVERSE = False

# --- directions (common.hpp:229-231) -----------------------------------------
# direction of the fusion partner relative to the breakpoint:
# UPSTREAM  = the rest of the transcript lies at coordinates > breakpoint
# DOWNSTREAM = the rest lies at coordinates < breakpoint
UPSTREAM = True
DOWNSTREAM = False

# --- transcript start (common.hpp:233-235) -----------------------------------
TRANSCRIPT_START_GENE1 = True
TRANSCRIPT_START_GENE2 = False

# --- confidence (common.hpp:224-227) -----------------------------------------
CONFIDENCE_LOW = 0
CONFIDENCE_MEDIUM = 1
CONFIDENCE_HIGH = 2

# --- strandedness (common.hpp:288-292) ---------------------------------------
STRANDEDNESS_NO = 0
STRANDEDNESS_YES = 1
STRANDEDNESS_REVERSE = 2
STRANDEDNESS_AUTO = 3

# --- mate roles within a fragment (common.hpp:208-211) -----------------------
MATE1 = 0
MATE2 = 1
SPLIT_READ = 1
SUPPLEMENTARY = 2

# --- CIGAR operations (BAM encoding, htslib sam.h) ---------------------------
CIGAR_MATCH = 0      # M
CIGAR_INS = 1        # I
CIGAR_DEL = 2        # D
CIGAR_REF_SKIP = 3   # N
CIGAR_SOFT_CLIP = 4  # S
CIGAR_HARD_CLIP = 5  # H
CIGAR_PAD = 6        # P
CIGAR_EQUAL = 7      # =
CIGAR_DIFF = 8       # X
CIGAR_OPS = "MIDNSHP=XB"  # render table covers the legacy B op the parser accepts

# bitmask helpers: op consumes query / reference
CIGAR_CONSUMES_QUERY = (1 << CIGAR_MATCH) | (1 << CIGAR_INS) | (1 << CIGAR_SOFT_CLIP) | (1 << CIGAR_EQUAL) | (1 << CIGAR_DIFF)
CIGAR_CONSUMES_REF = (1 << CIGAR_MATCH) | (1 << CIGAR_DEL) | (1 << CIGAR_REF_SKIP) | (1 << CIGAR_EQUAL) | (1 << CIGAR_DIFF)


def cigar_op(word: int) -> int:
    """CIGAR operation from a BAM-encoded 32-bit CIGAR word."""
    return word & 0xF


def cigar_oplen(word: int) -> int:
    """CIGAR operation length from a BAM-encoded 32-bit CIGAR word."""
    return word >> 4


def make_cigar_word(op: int, length: int) -> int:
    return (length << 4) | op


# --- the filter registry (common.hpp:26-68) -----------------------------------
# Order defines the numeric filter ids; ids are stored in per-read/per-fusion
# uint8 'filter' fields. FILTER_NONE == 0 means "not discarded".
FILTER_NAMES = (
    "",  # FILTER_none
    "duplicates",
    "inconsistently_clipped",
    "homopolymer",
    "read_through",
    "same_gene",
    "small_insert_size",
    "long_gap",
    "hairpin",
    "multimappers",
    "mismatches",
    "mismappers",
    "relative_support",
    "intronic",
    "non_coding_neighbors",
    "intragenic_exonic",
    "internal_tandem_duplication",
    "min_support",
    "known_fusions",
    "spliced",
    "blacklist",
    "end_to_end",
    "in_vitro",
    "merge_adjacent",
    "select_best",
    "marginal_read_through",
    "short_anchor",
    "no_coverage",
    "many_spliced",
    "no_genomic_support",
    "uninteresting_contigs",
    "viral_contigs",
    "top_expressed_viral_contigs",
    "low_coverage_viral_contigs",
    "genomic_support",
    "isoforms",
    "low_entropy",
    "homologs",
)

FILTER_IDS = {name: i for i, name in enumerate(FILTER_NAMES)}

FILTER_NONE = 0
FILTER_DUPLICATES = FILTER_IDS["duplicates"]
FILTER_INCONSISTENTLY_CLIPPED = FILTER_IDS["inconsistently_clipped"]
FILTER_HOMOPOLYMER = FILTER_IDS["homopolymer"]
FILTER_READ_THROUGH = FILTER_IDS["read_through"]
FILTER_SAME_GENE = FILTER_IDS["same_gene"]
FILTER_SMALL_INSERT_SIZE = FILTER_IDS["small_insert_size"]
FILTER_LONG_GAP = FILTER_IDS["long_gap"]
FILTER_HAIRPIN = FILTER_IDS["hairpin"]
FILTER_MULTIMAPPERS = FILTER_IDS["multimappers"]
FILTER_MISMATCHES = FILTER_IDS["mismatches"]
FILTER_MISMAPPERS = FILTER_IDS["mismappers"]
FILTER_RELATIVE_SUPPORT = FILTER_IDS["relative_support"]
FILTER_INTRONIC = FILTER_IDS["intronic"]
FILTER_NON_CODING_NEIGHBORS = FILTER_IDS["non_coding_neighbors"]
FILTER_INTRAGENIC_EXONIC = FILTER_IDS["intragenic_exonic"]
FILTER_INTERNAL_TANDEM_DUPLICATION = FILTER_IDS["internal_tandem_duplication"]
FILTER_MIN_SUPPORT = FILTER_IDS["min_support"]
FILTER_KNOWN_FUSIONS = FILTER_IDS["known_fusions"]
FILTER_SPLICED = FILTER_IDS["spliced"]
FILTER_BLACKLIST = FILTER_IDS["blacklist"]
FILTER_END_TO_END = FILTER_IDS["end_to_end"]
FILTER_IN_VITRO = FILTER_IDS["in_vitro"]
FILTER_MERGE_ADJACENT = FILTER_IDS["merge_adjacent"]
FILTER_SELECT_BEST = FILTER_IDS["select_best"]
FILTER_MARGINAL_READ_THROUGH = FILTER_IDS["marginal_read_through"]
FILTER_SHORT_ANCHOR = FILTER_IDS["short_anchor"]
FILTER_NO_COVERAGE = FILTER_IDS["no_coverage"]
FILTER_MANY_SPLICED = FILTER_IDS["many_spliced"]
FILTER_NO_GENOMIC_SUPPORT = FILTER_IDS["no_genomic_support"]
FILTER_UNINTERESTING_CONTIGS = FILTER_IDS["uninteresting_contigs"]
FILTER_VIRAL_CONTIGS = FILTER_IDS["viral_contigs"]
FILTER_TOP_EXPRESSED_VIRAL_CONTIGS = FILTER_IDS["top_expressed_viral_contigs"]
FILTER_LOW_COVERAGE_VIRAL_CONTIGS = FILTER_IDS["low_coverage_viral_contigs"]
FILTER_GENOMIC_SUPPORT = FILTER_IDS["genomic_support"]
FILTER_ISOFORMS = FILTER_IDS["isoforms"]
FILTER_LOW_ENTROPY = FILTER_IDS["low_entropy"]
FILTER_HOMOLOGS = FILTER_IDS["homologs"]

# switchable filters (everything except FILTER_none); used by the CLI's -f flag
SWITCHABLE_FILTERS = tuple(n for n in FILTER_NAMES if n)

# coordinates within this many bp of an exon boundary count as spliced
# (annotation.hpp:14)
MAX_SPLICE_SITE_DISTANCE = 2

# invalid/sentinel contig id (common.hpp uses USHRT_MAX)
CONTIG_NONE = 0xFFFF
