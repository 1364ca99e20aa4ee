"""The chimeric-alignment data model.

Reference parity: source/common.hpp:185-222 (alignment_t, mates_t,
chimeric_alignments_t). Ingest builds these per-fragment records once on the
host; everything downstream of annotation consumes the frozen structure-of-
arrays view (ReadBatch) built by `tensorize` for vectorized/device execution.

Coordinates are 0-based; `end` is inclusive (reference stores
bam_endpos - 1).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np

from .constants import (CIGAR_HARD_CLIP, CIGAR_SOFT_CLIP, FILTER_NONE, FORWARD,
                        MATE1, MATE2, SPLIT_READ, SUPPLEMENTARY, cigar_op,
                        cigar_oplen)

EMPTY_GENES = np.empty(0, np.int64)


@dataclass
class Alignment:
    """One aligned segment (common.hpp:191-207)."""

    supplementary: bool = False
    first_in_pair: bool = False
    exonic: bool = False
    strand: bool = FORWARD            # strand the read aligns to
    predicted_strand: bool = FORWARD  # strand predicted to be transcribed
    predicted_strand_ambiguous: bool = True
    contig: int = 0
    start: int = 0
    end: int = 0
    cigar: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint32))
    sequence: str = ""                # empty for supplementary alignments
    genes: np.ndarray = field(default_factory=lambda: EMPTY_GENES)  # sorted gene rows

    def preclipping(self) -> int:
        """common.hpp:205."""
        if len(self.cigar) and cigar_op(int(self.cigar[0])) in (CIGAR_SOFT_CLIP, CIGAR_HARD_CLIP):
            return cigar_oplen(int(self.cigar[0]))
        return 0

    def postclipping(self) -> int:
        """common.hpp:206."""
        if len(self.cigar) and cigar_op(int(self.cigar[-1])) in (CIGAR_SOFT_CLIP, CIGAR_HARD_CLIP):
            return cigar_oplen(int(self.cigar[-1]))
        return 0


class Fragment(List[Alignment]):
    """All alignments of one sequenced fragment (common.hpp:212-219).

    Layout convention matches the reference: [MATE1, MATE2] for discordant
    mates, [MATE1, SPLIT_READ, SUPPLEMENTARY] for split reads.
    """

    __slots__ = ("single_end", "multimapper", "duplicate", "filter")

    def __init__(self) -> None:
        super().__init__()
        self.single_end = False
        self.multimapper = False
        self.duplicate = False
        self.filter = FILTER_NONE


# ordered by read name like the reference's std::map (common.hpp:220-222);
# ingest sorts once after reading since no keys are added afterwards
ChimericAlignments = Dict[str, Fragment]


def strip_hi_tag_from_read_name(read_name: str) -> str:
    """common.hpp:222 — drop the ',HI' suffix appended during ingest."""
    idx = read_name.rfind(",")
    return read_name[:idx] if idx >= 0 else read_name


def sort_chimeric_alignments(chimeric_alignments: ChimericAlignments) -> ChimericAlignments:
    """Restore the reference's ordered-map iteration order (byte-wise by
    read name) after hash-based ingest."""
    return dict(sorted(chimeric_alignments.items()))


def mark_multimappers(chimeric_alignments: ChimericAlignments) -> int:
    """Flag fragments whose stripped read names collide
    (read_chimeric_alignments.cpp:792-802). Requires sorted order."""
    count = 0
    names = list(chimeric_alignments.keys())
    for i in range(len(names) - 1):
        if strip_hi_tag_from_read_name(names[i]) == strip_hi_tag_from_read_name(names[i + 1]):
            chimeric_alignments[names[i]].multimapper = True
            chimeric_alignments[names[i + 1]].multimapper = True
            count += 1
    return count
