"""Fusion candidate records.

Reference parity: source/common.hpp:237-286 (fusion_t, fusions_t). A fusion
is keyed by (gene1, gene2, contig1, contig2, breakpoint1, breakpoint2,
direction1, direction2); the table is insertion-ordered (deterministic given
the sorted read-name iteration of ingest), which replaces the reference's
unordered_map hash order as the canonical iteration order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from .annotation.tables import GeneTable
from .constants import (CONFIDENCE_LOW, CONTIG_NONE, DOWNSTREAM, FILTER_NONE,
                        FORWARD, TRANSCRIPT_START_GENE1, UPSTREAM)

FusionKey = Tuple[int, int, int, int, int, int, bool, bool]


@dataclass
class Fusion:
    """fusion_t (common.hpp:237-285)."""

    transcript_start_ambiguous: bool = True
    split_reads1: int = 0
    transcript_start: bool = TRANSCRIPT_START_GENE1
    split_reads2: int = 0
    spliced1: bool = False
    spliced2: bool = False
    exonic1: bool = False
    exonic2: bool = False
    predicted_strand1: bool = FORWARD
    predicted_strand2: bool = FORWARD
    direction1: bool = DOWNSTREAM
    direction2: bool = DOWNSTREAM
    confidence: int = CONFIDENCE_LOW
    filter: int = FILTER_NONE
    predicted_strands_ambiguous: bool = True
    discordant_mates: int = 0
    contig1: int = CONTIG_NONE
    contig2: int = CONTIG_NONE
    evalue: float = 0.0
    breakpoint1: int = -1
    breakpoint2: int = -1
    anchor_start1: int = 0
    anchor_start2: int = 0
    closest_genomic_breakpoint1: int = -1
    closest_genomic_breakpoint2: int = -1
    gene1: int = -1
    gene2: int = -1
    # read names of supporting fragments (keys into chimeric_alignments)
    split_read1_list: List[str] = field(default_factory=list)
    split_read2_list: List[str] = field(default_factory=list)
    discordant_mate_list: List[str] = field(default_factory=list)
    # native-store row indices of the same three lists (set by
    # materialize_fusions in retained mode; None on the Python path) —
    # lets the writer skip per-name index lookups
    support_rows: Optional[tuple] = None

    def supporting_reads(self) -> int:
        return self.split_reads1 + self.split_reads2 + self.discordant_mates

    def breakpoint_overlaps_both_genes(self, genes: GeneTable, which: int = 0) -> bool:
        """common.hpp:260-264."""
        if which == 1:
            return bool(genes.start[self.gene2] <= self.breakpoint1 <= genes.end[self.gene2])
        if which == 2:
            return bool(genes.start[self.gene1] <= self.breakpoint2 <= genes.end[self.gene1])
        return (self.breakpoint_overlaps_both_genes(genes, 1)
                or self.breakpoint_overlaps_both_genes(genes, 2))

    def is_read_through(self) -> bool:
        """common.hpp:265-269."""
        return (self.contig1 == self.contig2
                and self.breakpoint2 - self.breakpoint1 < 400000
                and self.direction1 == DOWNSTREAM and self.direction2 == UPSTREAM)

    def is_internal_tandem_duplication(self, max_itd_length: int) -> bool:
        """common.hpp:270-274."""
        return (self.gene1 == self.gene2
                and 0 <= self.breakpoint2 - self.breakpoint1 < max_itd_length
                and self.direction1 == UPSTREAM and self.direction2 == DOWNSTREAM)

    def is_intragenic(self, genes: GeneTable) -> bool:
        """common.hpp:275-279."""
        return self.gene1 == self.gene2 or (
            genes.start[self.gene2] - 10000 <= self.breakpoint1 <= genes.end[self.gene2] + 10000
            and genes.start[self.gene1] - 10000 <= self.breakpoint2 <= genes.end[self.gene1] + 10000
        )

    def both_breakpoints_spliced(self, genes: GeneTable) -> bool:
        """common.hpp:280-284."""
        return self.spliced1 and self.spliced2 and (
            (genes.strand[self.gene1] == genes.strand[self.gene2]) == (self.direction1 != self.direction2)
        )


Fusions = Dict[FusionKey, Fusion]
