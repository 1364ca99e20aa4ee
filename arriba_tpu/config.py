"""Pipeline configuration.

Reference parity: source/options.{cpp,hpp} — a single options struct threaded
through the pipeline, with per-filter enablement driven by the FILTERS
registry so names never drift. The CLI front-end (cli.py) maps the reference's
single-letter flags onto this dataclass.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict

from .constants import STRANDEDNESS_AUTO, SWITCHABLE_FILTERS
from .io.gtf import DEFAULT_GTF_FEATURES


def default_filters() -> Dict[str, bool]:
    return {name: True for name in SWITCHABLE_FILTERS}


@dataclass
class Options:
    """options_t (options.hpp:25-67) with defaults from
    get_default_options() (options.cpp:71-107)."""

    chimeric_bam_file: str = ""
    rna_bam_file: str = ""
    genomic_breakpoints_file: str = ""
    max_genomic_breakpoint_distance: int = 100000
    gene_annotation_file: str = ""
    exon_annotation_file: str = ""
    known_fusions_file: str = ""
    output_file: str = ""
    discarded_output_file: str = ""
    assembly_file: str = ""
    blacklist_file: str = ""
    interesting_contigs: str = "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 22 X Y AC_* NC_*"
    viral_contigs: str = "AC_* NC_*"
    top_viral_contigs: int = 5
    viral_contig_min_covered_fraction: float = 0.05
    homopolymer_length: int = 6
    min_read_through_distance: int = 10000
    filters: Dict[str, bool] = field(default_factory=default_filters)
    evalue_cutoff: float = 0.3
    min_support: int = 2
    max_mismapper_fraction: float = 0.8
    max_homolog_identity: float = 0.3
    min_anchor_length: int = 23
    print_extra_info_for_discarded_fusions: bool = False
    max_kmer_content: float = 0.6
    fragment_length: int = 200
    gtf_features: str = DEFAULT_GTF_FEATURES
    strandedness: int = STRANDEDNESS_AUTO
    min_spliced_events: int = 4
    mismatch_pvalue_cutoff: float = 0.01
    subsampling_threshold: int = 300
    high_expression_quantile: float = 0.998
    exonic_fraction: float = 0.33
    external_duplicate_marking: bool = False
    tags_file: str = ""
    protein_domains_file: str = ""
    fill_sequence_gaps: bool = False
    max_itd_length: int = 100
    min_itd_allele_fraction: float = 0.07
    min_itd_support: int = 10
    threads: int = 1
