"""Structure-of-arrays gene/transcript/exon tables.

Reference parity: source/common.hpp:148-183 (gene/transcript/exon records with
doubly-linked exon lists). The reference chases pointers between heap records;
here every record is a row index into dense numpy arrays, which is both the
deterministic analog of its pointer ordering (allocation order == parse order)
and the layout device kernels consume directly.

Coordinates are 0-based, inclusive on both ends (GTF 1-based start/end are
decremented on load, annotation.cpp:210-211).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np


@dataclass
class GeneTable:
    """One row per gene. Row index == the reference's deterministic gene id
    (arriba.cpp:321-325 assigns ids in list order = parse order)."""

    contig: np.ndarray = field(default_factory=lambda: np.empty(0, np.int32))
    start: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    end: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    strand: np.ndarray = field(default_factory=lambda: np.empty(0, np.bool_))   # True=forward
    gene_id: List[str] = field(default_factory=list)    # GTF gene_id attribute
    name: List[str] = field(default_factory=list)       # GTF gene_name attribute
    exonic_length: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    is_dummy: np.ndarray = field(default_factory=lambda: np.empty(0, np.bool_))
    is_protein_coding: np.ndarray = field(default_factory=lambda: np.empty(0, np.bool_))

    def __len__(self) -> int:
        return len(self.gene_id)

    def length(self, g: int) -> int:
        """annotation_record_t::length() == end - start (common.hpp:126)."""
        return int(self.end[g] - self.start[g])

    def append_dummy(self, contig: int, start: int, end: int) -> int:
        """Append a dummy gene for intergenic breakpoints (arriba.cpp:232-260)."""
        g = len(self)
        self.contig = np.append(self.contig, np.int32(contig))
        self.start = np.append(self.start, np.int64(start))
        self.end = np.append(self.end, np.int64(end))
        self.strand = np.append(self.strand, True)  # FORWARD
        self.gene_id.append("")
        self.name.append("")
        self.exonic_length = np.append(self.exonic_length, np.int64(10000))
        self.is_dummy = np.append(self.is_dummy, True)
        self.is_protein_coding = np.append(self.is_protein_coding, False)
        return g

    def append_dummies(self, contigs, starts, ends) -> int:
        """Bulk form of append_dummy: one concatenate per column instead of
        a full-table copy per dummy gene. Returns the first new row."""
        g = len(self)
        n = len(contigs)
        self.contig = np.concatenate(
            [self.contig, np.asarray(contigs, np.int32)])
        self.start = np.concatenate([self.start, np.asarray(starts, np.int64)])
        self.end = np.concatenate([self.end, np.asarray(ends, np.int64)])
        self.strand = np.concatenate(
            [self.strand, np.ones(n, np.bool_)])  # FORWARD
        self.gene_id.extend([""] * n)
        self.name.extend([""] * n)
        self.exonic_length = np.concatenate(
            [self.exonic_length, np.full(n, 10000, np.int64)])
        self.is_dummy = np.concatenate([self.is_dummy, np.ones(n, np.bool_)])
        self.is_protein_coding = np.concatenate(
            [self.is_protein_coding, np.zeros(n, np.bool_)])
        return g


@dataclass
class TranscriptTable:
    """One row per transcript (keyed by version-stripped id in the GTF parser)."""

    name: List[str] = field(default_factory=list)  # transcript_id as in GTF
    first_exon: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))  # exon row with min start
    last_exon: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))   # exon row with max end
    coding_length: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))

    def __len__(self) -> int:
        return len(self.name)


@dataclass
class ExonTable:
    """One row per exon; prev/next follow genomic order within the exon's
    transcript grouping (annotation.cpp:322-329), -1 at the ends."""

    contig: np.ndarray = field(default_factory=lambda: np.empty(0, np.int32))
    start: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    end: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    strand: np.ndarray = field(default_factory=lambda: np.empty(0, np.bool_))
    gene: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    transcript: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    prev_exon: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    next_exon: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    coding_region_start: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))  # -1 if non-coding
    coding_region_end: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))    # -1 if non-coding

    def __len__(self) -> int:
        return len(self.gene)


@dataclass
class Annotation:
    """The complete gene model plus its interval indices (built lazily)."""

    genes: GeneTable
    transcripts: TranscriptTable
    exons: ExonTable
    gene_names: Dict[str, int] = field(default_factory=dict)  # name -> gene row (last wins, annotation.cpp:372-375)
