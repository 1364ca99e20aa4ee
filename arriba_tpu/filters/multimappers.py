"""Multimapper resolution: keep only the best-scoring alignment per read.

Reference parity: source/filter_multimappers.cpp. Alignment scores are a
CIGAR walk counting matches minus gaps/mismatches (splice-aware: reference
skips at annotated splice sites are free); ties between equal-scoring
alignments are broken by the support of the fusion each alignment belongs
to, with a fully deterministic comparator chain.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..annotation.index import IntervalIndex
from ..annotation.queries import is_breakpoint_spliced
from ..annotation.tables import ExonTable, GeneTable
from ..constants import (CIGAR_DEL, CIGAR_DIFF, CIGAR_EQUAL, CIGAR_HARD_CLIP,
                         CIGAR_INS, CIGAR_MATCH, CIGAR_REF_SKIP,
                         CIGAR_SOFT_CLIP, DOWNSTREAM, FILTER_MULTIMAPPERS,
                         FILTER_NONE, FORWARD, MATE1, MATE2, SPLIT_READ,
                         SUPPLEMENTARY, UPSTREAM, cigar_op, cigar_oplen)
from ..fusion import Fusion, Fusions
from ..io.fasta import Assembly
from ..model import Alignment, ChimericAlignments, Fragment, strip_hi_tag_from_read_name
from ..seq import reverse_complement_str

INT_MIN = -(2 ** 31)


def _is_gap_at_splice_site(position: int, direction: bool, gene_set: np.ndarray,
                           genes: GeneTable, exons: ExonTable,
                           exon_index: IntervalIndex) -> bool:
    """filter_multimappers.cpp:10-15."""
    for gene in gene_set:
        if is_breakpoint_spliced(int(gene), direction, position, genes, exons, exon_index):
            return True
    return False


def _calculate_segment_score(alignment: Alignment, sequence: str, assembly: Assembly,
                             genes: GeneTable, exons: ExonTable,
                             exon_index: IntervalIndex) -> int:
    """filter_multimappers.cpp:17-79."""
    contig_seq = assembly.get(alignment.contig)
    if contig_seq is None:
        return 0

    score = 0
    reference_position = alignment.start
    read_position = 0
    for word in alignment.cigar:
        op = cigar_op(int(word))
        oplen = cigar_oplen(int(word))
        if op in (CIGAR_SOFT_CLIP, CIGAR_HARD_CLIP):
            # no difference between soft/hard clips: `sequence` comes from the
            # SPLIT_READ, which is never hard-clipped
            read_position += oplen
        elif op == CIGAR_DEL:
            score -= 1
            reference_position += oplen
        elif op == CIGAR_REF_SKIP:
            if (not _is_gap_at_splice_site(reference_position, DOWNSTREAM, alignment.genes,
                                           genes, exons, exon_index)
                    or not _is_gap_at_splice_site(reference_position + oplen, UPSTREAM,
                                                  alignment.genes, genes, exons, exon_index)):
                score -= 1  # penalize reference skips except at splice sites
            reference_position += oplen
        elif op == CIGAR_INS:
            score -= 1
            read_position += oplen
        elif op in (CIGAR_EQUAL, CIGAR_DIFF):
            if op == CIGAR_EQUAL:
                score += oplen
            reference_position += oplen
            read_position += oplen
        elif op == CIGAR_MATCH:
            ref_window = contig_seq[reference_position:reference_position + oplen]
            read_window = np.frombuffer(
                sequence[read_position:read_position + oplen].encode("latin-1"), np.uint8)
            n = min(len(ref_window), len(read_window))
            score += int(np.count_nonzero(ref_window[:n] == read_window[:n]))
            reference_position += oplen
            read_position += oplen
    return score


def calculate_alignment_score(mates: Fragment, assembly: Assembly, genes: GeneTable,
                              exons: ExonTable, exon_index: IntervalIndex) -> int:
    """filter_multimappers.cpp:81-110 (the reference embeds this in
    calculate_alignment_score plus the SUPPLEMENTARY special case)."""
    score = _calculate_segment_score(mates[MATE1], mates[MATE1].sequence, assembly,
                                     genes, exons, exon_index)
    score += _calculate_segment_score(mates[MATE2], mates[MATE2].sequence, assembly,
                                      genes, exons, exon_index)

    if len(mates) == 3:
        split = mates[SPLIT_READ]
        supp = mates[SUPPLEMENTARY]
        supp_sequence = (split.sequence if supp.strand == split.strand
                         else reverse_complement_str(split.sequence))
        score += _calculate_segment_score(supp, supp_sequence, assembly,
                                          genes, exons, exon_index)
        # penalize if the read is not split at a splice site
        supp_pos = supp.end if supp.strand == FORWARD else supp.start
        supp_dir = DOWNSTREAM if supp.strand == FORWARD else UPSTREAM
        split_pos = split.start if split.strand == FORWARD else split.end
        split_dir = UPSTREAM if split.strand == FORWARD else DOWNSTREAM
        if (not _is_gap_at_splice_site(supp_pos, supp_dir, supp.genes, genes, exons, exon_index)
                or not _is_gap_at_splice_site(split_pos, split_dir, split.genes,
                                              genes, exons, exon_index)):
            score -= 1
    return score


def fusion_has_more_support(fusion: Optional[Fusion], current_best: Optional[Fusion],
                            genes: GeneTable) -> bool:
    """filter_multimappers.cpp:82-110 — deterministic 'more support' order.
    The reference's final tie-breaks compare the deterministic gene ids
    assigned in arriba.cpp:321-325, which equal our gene rows."""
    if fusion is None:
        return False
    if current_best is None:
        return True
    if current_best.supporting_reads() != fusion.supporting_reads():
        return current_best.supporting_reads() < fusion.supporting_reads()
    if genes.is_protein_coding[fusion.gene1] != genes.is_protein_coding[current_best.gene1]:
        return bool(genes.is_protein_coding[fusion.gene1])
    if genes.is_protein_coding[fusion.gene2] != genes.is_protein_coding[current_best.gene2]:
        return bool(genes.is_protein_coding[fusion.gene2])
    if fusion.contig1 != current_best.contig1:
        return fusion.contig1 < current_best.contig1
    if fusion.contig2 != current_best.contig2:
        return fusion.contig2 < current_best.contig2
    if fusion.breakpoint1 != current_best.breakpoint1:
        return fusion.breakpoint1 < current_best.breakpoint1
    if fusion.breakpoint2 != current_best.breakpoint2:
        return fusion.breakpoint2 < current_best.breakpoint2
    if fusion.direction1 != current_best.direction1:
        return fusion.direction1 < current_best.direction1
    if fusion.direction2 != current_best.direction2:
        return fusion.direction2 < current_best.direction2
    if fusion.gene1 != current_best.gene1:
        return fusion.gene1 < current_best.gene1
    return fusion.gene2 < current_best.gene2


def filter_multimappers(chimeric_alignments: ChimericAlignments, fusions: Fusions,
                        assembly: Assembly, genes: GeneTable, exons: ExonTable,
                        exon_index: IntervalIndex) -> int:
    """filter_multimappers.cpp:115-221."""
    from itertools import chain

    # for each multi-mapper, find the fusion with the most supporting reads
    # (only multi-mapping read names are ever looked up below)
    multimapper_names = {name for name, mates in chimeric_alignments.items()
                         if mates.multimapper}
    most_supported_fusion: Dict[str, Fusion] = {}
    if multimapper_names:
        for fusion in fusions.values():
            for name in chain(fusion.split_read1_list, fusion.split_read2_list,
                              fusion.discordant_mate_list):
                if name in multimapper_names and fusion_has_more_support(
                        fusion, most_supported_fusion.get(name), genes):
                    most_supported_fusion[name] = fusion

    # for each cluster of multi-mapping alignments, pick the highest score
    names = list(chimeric_alignments.keys())
    cluster_start = 0
    best_name: Optional[str] = None
    best_score = INT_MIN
    i = 0
    while i <= len(names):
        stripped = strip_hi_tag_from_read_name(names[i]) if i < len(names) else None
        cluster_name = (strip_hi_tag_from_read_name(names[cluster_start])
                        if cluster_start < len(names) else None)
        if stripped != cluster_name:
            # close the previous cluster: discard all but the best multimapper
            if best_name is not None:
                for j in range(cluster_start, i):
                    mates = chimeric_alignments[names[j]]
                    if names[j] != best_name and mates.filter == FILTER_NONE:
                        mates.filter = FILTER_MULTIMAPPERS
            cluster_start = i
            best_name = None
            best_score = INT_MIN
        if i == len(names):
            break
        # skip score calculation for uniquely-mapping reads
        next_stripped = (strip_hi_tag_from_read_name(names[i + 1])
                         if i + 1 < len(names) else None)
        if cluster_start == i and next_stripped != strip_hi_tag_from_read_name(names[i]):
            i += 1
            continue
        score = calculate_alignment_score(chimeric_alignments[names[i]], assembly,
                                          genes, exons, exon_index)
        if best_score < score:
            best_name = names[i]
            best_score = score
        elif best_score == score:
            if fusion_has_more_support(most_supported_fusion.get(names[i]),
                                       most_supported_fusion.get(best_name), genes):
                best_name = names[i]
        i += 1

    # reduce supporting-read counts where reads were discarded as multimappers
    # (a no-op when nothing was discarded: fusions with zero support are
    # skipped by the guard, so no filter flags could change either)
    discarded = {name for name, mates in chimeric_alignments.items()
                 if mates.filter == FILTER_MULTIMAPPERS}
    if discarded:
        for fusion in fusions.values():
            if fusion.filter != FILTER_NONE or fusion.supporting_reads() == 0:
                continue
            for name in fusion.split_read1_list:
                if name in discarded and fusion.split_reads1 > 0:
                    fusion.split_reads1 -= 1
            for name in fusion.split_read2_list:
                if name in discarded and fusion.split_reads2 > 0:
                    fusion.split_reads2 -= 1
            for name in fusion.discordant_mate_list:
                if name in discarded and fusion.discordant_mates > 0:
                    fusion.discordant_mates -= 1
            if fusion.supporting_reads() == 0:  # all supporting reads discarded
                fusion.filter = FILTER_MULTIMAPPERS

    return sum(1 for f in fusions.values() if f.filter == FILTER_NONE)
